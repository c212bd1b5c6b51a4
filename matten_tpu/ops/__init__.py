"""Static O(3) algebra + compute ops.

Everything in this package is *trace-time* machinery: irreps bookkeeping,
Clebsch-Gordan/Wigner tables, instruction builders. The tables it emits are
plain numpy arrays baked into jitted computations as constants.
"""

from matten_tpu.ops.irreps import Irrep, Irreps
from matten_tpu.ops.wigner import wigner_3j, generators, rotation_matrix, irrep_rotation

__all__ = [
    "Irrep",
    "Irreps",
    "wigner_3j",
    "generators",
    "rotation_matrix",
    "irrep_rotation",
]
