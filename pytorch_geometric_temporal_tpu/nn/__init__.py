"""API-parity alias of :mod:`..models` (reference layout: ``nn.recurrent``,
``nn.attention``, ``nn.hetero``)."""

from . import attention, hetero, recurrent  # noqa: F401
from ..models import *  # noqa: F401,F403
