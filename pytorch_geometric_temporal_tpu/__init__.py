"""pytorch_geometric_temporal_tpu — a TPU-native spatiotemporal GNN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
PyTorch Geometric Temporal (benedekrozemberczki/pytorch_geometric_temporal):
temporal graph signal pipelines, recurrent & attention spatiotemporal GNNs,
dataset loaders, and multi-chip training via ``jax.sharding``.

Typical usage::

    import pytorch_geometric_temporal_tpu as pgtt
"""

__version__ = "0.1.0"

from . import data, models, ops, parallel, signal, train  # noqa: F401
from . import dataset, nn  # noqa: F401  (reference-layout aliases)
from .config import config_override, get_config  # noqa: F401
from .data import *  # noqa: F401,F403
from .models import *  # noqa: F401,F403
from .ops import Graph  # noqa: F401
from .signal import *  # noqa: F401,F403
