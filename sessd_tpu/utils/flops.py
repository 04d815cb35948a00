"""FLOPs / memory counting via XLA's cost analysis.

Replaces the reference's 446-line module-hook FLOPs counter
(det3d/utils/flops_counter.py, tools/get_flops.py): XLA already knows the
cost of the compiled program, so we just ask it.
"""
from __future__ import annotations

from typing import Any, Callable


def cost_analysis(fn: Callable, *args, **kwargs) -> dict:
    """Compile ``fn`` and return {'flops': ..., 'bytes accessed': ...}."""
    import jax

    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns a list per computation
        costs = costs[0]
    return dict(costs)


def count_model_flops(model, variables, *inputs, **kw) -> dict:
    """GFLOPs of one forward pass of a flax model."""
    import jax

    def fwd(variables, *inputs):
        return model.apply(variables, *inputs, **kw)

    costs = cost_analysis(fwd, variables, *inputs)
    flops = costs.get("flops", 0.0)
    return {
        "flops": flops,
        "gflops": flops / 1e9,
        "bytes_accessed": costs.get("bytes accessed", 0.0),
    }
