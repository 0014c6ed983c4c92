from . import conv  # noqa: F401
from .attention import (  # noqa: F401
    AAGCN,
    ASTGCN,
    DNNTSP,
    GMAN,
    MSTGCN,
    MTGNN,
    STConv,
    TemporalConv,
)
from .conv import (  # noqa: F401
    AVWGCN,
    ChebConv,
    GatedGraphConv,
    GCNConv,
    RGCNConv,
    SAGEConv,
    cheb_basis,
    gcn_conv_fixed_w,
    topk_pool,
)
from .hetero import HeteroGCLSTM  # noqa: F401
from .recurrent import (  # noqa: F401
    AGCRN,
    A3TGCN,
    A3TGCN2,
    DConv,
    DCRNN,
    DCRNNSeq,
    DyGrEncoder,
    EvolveGCNH,
    EvolveGCNHSeq,
    EvolveGCNO,
    EvolveGCNOSeq,
    GCLSTM,
    GConvGRU,
    GConvLSTM,
    LRGCN,
    MPNNLSTM,
    TGCN,
    TGCN2,
    split_relations,
)
