"""Space classes matched to what the reference's gym_env helpers touch
(`/root/reference/pddp/envs/gym_env.py:159-176`: isinstance checks plus
``.low/.high/.shape/.dtype/.n/.nvec``)."""

import numpy as np


class Space(object):

    def __init__(self, shape=None, dtype=None):
        self.shape = None if shape is None else tuple(shape)
        self.dtype = None if dtype is None else np.dtype(dtype)


class Box(Space):

    def __init__(self, low, high, shape=None, dtype=np.float32):
        if shape is None:
            shape = np.broadcast(np.asarray(low), np.asarray(high)).shape
        super(Box, self).__init__(shape, dtype)
        self.low = np.broadcast_to(np.asarray(low, dtype), shape).copy()
        self.high = np.broadcast_to(np.asarray(high, dtype), shape).copy()


class Discrete(Space):

    def __init__(self, n):
        super(Discrete, self).__init__((), np.int64)
        self.n = int(n)


class MultiDiscrete(Space):

    def __init__(self, nvec):
        self.nvec = np.asarray(nvec, dtype=np.int64)
        super(MultiDiscrete, self).__init__(self.nvec.shape, np.int64)


class MultiBinary(Space):

    def __init__(self, n):
        super(MultiBinary, self).__init__((int(n),), np.int8)
        self.n = int(n)


__all__ = ["Space", "Box", "Discrete", "MultiDiscrete", "MultiBinary"]
