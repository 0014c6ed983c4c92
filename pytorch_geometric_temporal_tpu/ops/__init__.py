from .graph import (
    Graph,
    cheb_norm,
    diffusion_norms,
    gcn_norm,
    lambda_max,
    laplacian,
    pad_graphs,
    stack_graphs,
)
from .bcsr import BCSRMatrix, bcsr_spmm
from .operators import (
    DiffusionOperators,
    Prenormalized,
    PreparedGraph,
    host_cheb_norm,
    host_diffusion_norms,
    host_gcn_norm,
    prenormalize_cheb,
    prenormalize_gcn,
    prepare_graph,
)
from .spmm import sddmm, spmm, spmm_dense, spmm_segment

__all__ = [
    "Graph",
    "cheb_norm",
    "diffusion_norms",
    "gcn_norm",
    "lambda_max",
    "laplacian",
    "pad_graphs",
    "stack_graphs",
    "BCSRMatrix",
    "bcsr_spmm",
    "DiffusionOperators",
    "Prenormalized",
    "PreparedGraph",
    "prepare_graph",
    "host_cheb_norm",
    "host_diffusion_norms",
    "host_gcn_norm",
    "prenormalize_cheb",
    "prenormalize_gcn",
    "sddmm",
    "spmm",
    "spmm_dense",
    "spmm_segment",
]
