"""Deterministic reference-shaped weight generation, shared by
scripts/make_torch_goldens.py (producer) and tests/test_ref_goldens.py
(consumer). Values depend only on (name, shape) via crc32(name), so the
golden npz needs to store just the state-dict names+shapes."""
import zlib

import numpy as np


def _kind(name: str, shape) -> str:
    if name.endswith("running_mean"):
        return "running_mean"
    if name.endswith("running_var"):
        return "running_var"
    if ".weight" in name and len(shape) == 1:
        return "bn_weight"
    if name.endswith(".bias"):
        return "bn_bias"
    return "conv"


def deterministic_value(name: str, shape) -> np.ndarray:
    kind = _kind(name, shape)
    rng = np.random.RandomState(zlib.crc32(name.encode()) % (2 ** 31 - 1))
    if kind in ("bn_weight", "running_var"):
        return rng.uniform(0.6, 1.4, shape).astype(np.float32)
    if kind == "conv":
        # fan-in-aware scale keeps 14-layer activations O(1) so the golden
        # comparison is numerically well-conditioned
        p = int(np.prod(shape))
        if len(shape) == 5:          # spconv [kd, kh, kw, cin, cout]
            fan = p // shape[-1]
        elif len(shape) == 4:        # torch conv [out, in, kh, kw] /
            fan = p // (shape[1] if "deconv" in name else shape[0])
        elif len(shape) >= 2:
            fan = p // shape[0]
        else:
            fan = max(shape[0], 1)
        return (rng.standard_normal(shape) / np.sqrt(fan)).astype(np.float32)
    return (rng.standard_normal(shape) * 0.1).astype(np.float32)


def reference_state_dict(names, shapes) -> dict:
    """names: iterable of str; shapes: iterable of 'a,b,c' strings."""
    sd = {}
    for name, shape_s in zip(names, shapes):
        shape = tuple(int(s) for s in str(shape_s).split(",") if s != "")
        sd[name] = deterministic_value(name, shape)
    return sd
