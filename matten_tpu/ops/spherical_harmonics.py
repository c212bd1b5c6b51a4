"""Real spherical harmonics, derived from the framework's own CG tables.

Replaces e3nn's `o3.SphericalHarmonics` (used at reference
nn/_nequip.py:167 with normalize=True, normalization="component").

Construction: Y_0 = 1, Y_1(r) = r (in (x,y,z) order, see ops/wigner.py), and
Y_l = c_l * <w3j(l-1, 1, l), Y_{l-1}, Y_1>, which is equivariant by
construction with respect to this framework's generator conventions. The
per-degree constants c_l are chosen so that on the unit sphere
||Y_l||^2 = 2l+1 ("component" normalization: each component has unit second
moment over the sphere).

Parity: Y_l transforms as irrep (l, (-1)^l) — i.e. 0e + 1o + 2e + 3o + ...
"""

from __future__ import annotations

import functools
from typing import Sequence, Union

import jax.numpy as jnp
import numpy as np

from matten_tpu.ops.irreps import Irreps
from matten_tpu.ops.wigner import wigner_3j

__all__ = ["spherical_harmonics", "sh_irreps"]


def sh_irreps(lmax: int) -> Irreps:
    return Irreps.spherical_harmonics(lmax)


@functools.lru_cache(maxsize=None)
def _sh_constants(lmax: int) -> tuple:
    """Per-degree scale constants for component normalization (float64)."""
    # run the recursion on a fixed generic unit vector in numpy
    v = np.array([0.2672612419124244, -0.5345224838248488, 0.8017837257372732])
    v = v / np.linalg.norm(v)
    ys = [np.ones(1), v.copy()]
    consts = [1.0, np.sqrt(3.0)]
    for l in range(2, lmax + 1):
        c = wigner_3j(l - 1, 1, l)
        raw = np.einsum("i,j,ijk->k", ys[-1], v, c)
        # ||raw|| is rotation-invariant, hence constant on the unit sphere
        scale = np.sqrt(2 * l + 1) / np.linalg.norm(raw)
        ys.append(raw * scale)
        consts.append(scale)
    return tuple(consts)


def spherical_harmonics(
    lmax_or_irreps: Union[int, Irreps, str, Sequence[int]],
    vectors: jnp.ndarray,
    normalize: bool = True,
    normalization: str = "component",
) -> jnp.ndarray:
    """Evaluate real spherical harmonics of `vectors` ([..., 3], (x,y,z)).

    Args:
        lmax_or_irreps: either an int lmax (produces all l = 0..lmax) or an
            Irreps like "0e+1o+2e+3o+4e" whose degrees are produced (each ls
            entry must have multiplicity 1 and natural parity).
        vectors: [..., 3] input vectors.
        normalize: normalize input vectors to unit length first (the zero
            vector maps to zero-degree-safe output: Y_0 stays 1, higher
            degrees are computed from the zero unit vector guard).
        normalization: "component" (each component unit second moment; the
            reference's setting) or "norm" (||Y_l|| = 1) or "integral".

    Returns:
        [..., sum(2l+1)] concatenated over the requested degrees, ascending.
    """
    if isinstance(lmax_or_irreps, int):
        ls = list(range(lmax_or_irreps + 1))
    else:
        irreps = Irreps(lmax_or_irreps)
        ls = []
        for mul, ir in irreps:
            if mul != 1:
                raise ValueError(f"SH irreps must have multiplicity 1, got {irreps}")
            if ir.p != (-1) ** ir.l:
                raise ValueError(f"SH irreps must have natural parity, got {irreps}")
            ls.append(ir.l)
        if ls != sorted(ls):
            raise ValueError(f"SH irreps must be in ascending l order, got {irreps}")
    lmax = max(ls)
    consts = _sh_constants(lmax)
    dtype = vectors.dtype

    v = vectors
    if normalize:
        n = jnp.linalg.norm(v, axis=-1, keepdims=True)
        v = v / jnp.where(n > 0, n, 1.0)

    ys = [jnp.ones(v.shape[:-1] + (1,), dtype=dtype), v]
    for l in range(2, lmax + 1):
        c = jnp.asarray(wigner_3j(l - 1, 1, l) * consts[l], dtype=dtype)
        ys.append(jnp.einsum("...i,...j,ijk->...k", ys[-1], v, c))
    # ys[1] currently equals the unit vector; apply component norm sqrt(3)
    ys[1] = ys[1] * jnp.asarray(consts[1], dtype=dtype)

    out = []
    for l in ls:
        y = ys[l]
        if normalization == "component":
            pass  # already component-normalized
        elif normalization == "norm":
            y = y / np.sqrt(2 * l + 1)
        elif normalization == "integral":
            y = y / np.sqrt(4.0 * np.pi)
        else:
            raise ValueError(f"unknown normalization {normalization!r}")
        out.append(y)
    return jnp.concatenate(out, axis=-1)
