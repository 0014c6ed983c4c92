"""API-parity alias of :mod:`..data` (reference layout: ``dataset``)."""

from ..data import *  # noqa: F401,F403
