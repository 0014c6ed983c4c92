"""Actionable input validation shared by model entry points.

Misuse of a model (wrong layout, mismatched node axis) should fail with a
message naming the EXPECTED layout, not a cryptic broadcast error three
layers down in an einsum.  These checks run at trace time on static shapes
— zero runtime cost under jit.
"""

from __future__ import annotations


def _num_nodes(graph) -> int:
    src = getattr(graph, "src_count", None)
    return src if src is not None else graph.num_nodes


def check_node_axis(x, graph, model: str, layout: str, axis: int = -2):
    """Assert x's node axis matches the graph, with a layout-naming error."""
    n = _num_nodes(graph)
    if x.shape[axis] != n:
        raise ValueError(
            f"{model} expects input laid out as {layout} with the node axis "
            f"(axis {axis}) equal to the graph's {n} nodes; got input shape "
            f"{tuple(x.shape)}. Check the axis order — transpose with "
            f"jnp.moveaxis/jnp.transpose if your data uses another layout."
        )


def check_rank(x, model: str, layout: str, ranks):
    if isinstance(ranks, int):
        ranks = (ranks,)
    if x.ndim not in ranks:
        expect = " or ".join(f"rank {r}" for r in ranks)
        raise ValueError(
            f"{model} expects input {layout} ({expect}); got rank {x.ndim} "
            f"(shape {tuple(x.shape)})."
        )
