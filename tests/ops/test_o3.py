"""Equivariance + numerics tests for the from-scratch O(3) core.

Modeled on the reference's testing centerpiece — rotate the input, compare
the rotated output (tests/model/test_tfn_tensor.py:137-139) — applied here
per-component as SURVEY.md SS4 prescribes.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from matten_tpu.ops.irreps import Irrep, Irreps, tp_path_exists
from matten_tpu.ops.wigner import (
    generators,
    wigner_3j,
    irrep_rotation,
    irreps_rotation,
    random_rotation,
)
from matten_tpu.ops.spherical_harmonics import spherical_harmonics
from matten_tpu.ops.tensor_product import (
    LinearPlan,
    fully_connected_tp_plan,
    uvu_tp_plan,
)
from matten_tpu.ops.cartesian import cartesian_tensor_map


class TestIrreps:
    def test_parse_and_dim(self):
        ir = Irreps("32x0o+32x0e + 16x1o+16x1e + 4x2o+4x2e + 2x3o+2x3e + 2x4e")
        assert ir.dim == 32 + 32 + 16 * 3 * 2 + 4 * 5 * 2 + 2 * 7 * 2 + 2 * 9
        assert ir.num_irreps == 32 + 32 + 16 + 16 + 4 + 4 + 2 + 2 + 2
        assert ir.lmax == 4
        assert str(Irreps("16x0e")) == "16x0e"

    def test_sort_order(self):
        # 0e < 0o < 1o < 1e < 2e < 2o
        s, _, _ = Irreps("2o+1o+0o+2e+0e+1e").sort()
        assert str(s) == "0e+0o+1o+1e+2e+2o"

    def test_sort_permutation_convention(self):
        ir = Irreps("1o+0e")
        s, perm, inv = ir.sort()
        assert str(s) == "0e+1o"
        assert perm == [1, 0]
        assert [ir[i] for i in inv] == list(s)

    def test_simplify(self):
        assert str(Irreps("4x0e+2x0e+1o+1o").simplify()) == "6x0e+2x1o"

    def test_mul(self):
        assert Irrep.make("1o") * Irrep.make("1o") == [
            Irrep(0, 1),
            Irrep(1, 1),
            Irrep(2, 1),
        ]

    def test_tp_path_exists(self):
        assert tp_path_exists("1o", "1o", "0e")
        assert not tp_path_exists("1o", "1o", "0o")
        assert tp_path_exists("16x0e+4x1o", "0e+1o+2e", "2o")
        assert not tp_path_exists("16x0e+4x1o", "0e+1o+2e", "4e")


class TestWigner:
    def test_generator_commutators(self):
        for l in range(6):
            k = generators(l)
            for a in range(3):
                b, c = (a + 1) % 3, (a + 2) % 3
                np.testing.assert_allclose(
                    k[a] @ k[b] - k[b] @ k[a], k[c], atol=1e-10
                )

    def test_l1_is_cartesian(self):
        rng = np.random.default_rng(0)
        r = random_rotation(rng)
        np.testing.assert_allclose(irrep_rotation(1, -1, r), r, atol=1e-12)

    @pytest.mark.parametrize(
        "ls", [(1, 1, 0), (1, 1, 1), (1, 1, 2), (2, 2, 4), (3, 4, 2), (4, 4, 0)]
    )
    def test_wigner3j_invariance(self, ls):
        l1, l2, l3 = ls
        c = wigner_3j(l1, l2, l3)
        assert abs(np.linalg.norm(c) - 1.0) < 1e-10
        rng = np.random.default_rng(1)
        for improper in (False, True):
            r = random_rotation(rng, improper=improper)
            p1, p2 = (-1) ** l1, (-1) ** l2
            d1 = irrep_rotation(l1, p1, r)
            d2 = irrep_rotation(l2, p2, r)
            # the invariant couples parities p3 = p1*p2 (selection rule)
            d3 = irrep_rotation(l3, p1 * p2, r)
            lhs = np.einsum("ia,jb,kc,abc->ijk", d1, d2, d3, c)
            np.testing.assert_allclose(lhs, c, atol=1e-8)

    def test_wigner3j_special_cases(self):
        # 1x1->0 is delta/sqrt(3); 1x1->1 is epsilon/sqrt(6)
        np.testing.assert_allclose(
            wigner_3j(1, 1, 0)[:, :, 0], np.eye(3) / np.sqrt(3), atol=1e-10
        )
        c = wigner_3j(1, 1, 1)
        assert abs(c[0, 1, 2] - 1 / np.sqrt(6)) < 1e-10
        assert abs(c[1, 0, 2] + 1 / np.sqrt(6)) < 1e-10


class TestSphericalHarmonics:
    def test_equivariance(self):
        rng = np.random.default_rng(3)
        v = jnp.asarray(rng.normal(size=(11, 3)), dtype=jnp.float32)
        y = np.asarray(spherical_harmonics(4, v))
        for improper in (False, True):
            r = random_rotation(rng, improper=improper)
            yr = np.asarray(
                spherical_harmonics(4, v @ jnp.asarray(r, dtype=jnp.float32).T)
            )
            d = irreps_rotation(Irreps.spherical_harmonics(4), r)
            np.testing.assert_allclose(yr, y @ d.T, atol=2e-5)

    def test_l1_identity(self):
        v = jnp.asarray([[0.0, 0.0, 2.0], [3.0, 0.0, 0.0]])
        y = np.asarray(spherical_harmonics("0e+1o", v, normalize=True))
        np.testing.assert_allclose(
            y,
            np.array(
                [[1, 0, 0, np.sqrt(3)], [1, np.sqrt(3), 0, 0]], dtype=np.float32
            ),
            atol=1e-6,
        )

    def test_component_normalization(self):
        rng = np.random.default_rng(4)
        v = jnp.asarray(rng.normal(size=(100000, 3)))
        y = np.asarray(spherical_harmonics(3, v))
        np.testing.assert_allclose((y**2).mean(axis=0), 1.0, atol=0.05)

    def test_irreps_selection(self):
        v = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)))
        y = spherical_harmonics("0e+1o+2e+3o+4e", v)
        assert y.shape == (5, 25)


class TestTensorProduct:
    IR1 = Irreps("8x0e+4x1o+2x2e")
    IR2 = Irreps("0e+1o+2e")
    IRO = Irreps("8x0e+4x1o+4x1e+2x2e")

    def test_fctp_equivariance(self):
        rng = np.random.default_rng(5)
        plan = fully_connected_tp_plan(self.IR1, self.IR2, self.IRO)
        w = jnp.asarray(rng.normal(size=(plan.weight_numel,)), dtype=jnp.float32)
        x1 = jnp.asarray(rng.normal(size=(5, self.IR1.dim)), dtype=jnp.float32)
        x2 = jnp.asarray(rng.normal(size=(5, self.IR2.dim)), dtype=jnp.float32)
        out = np.asarray(plan.apply(x1, x2, w))
        r = random_rotation(rng, improper=True)
        d1 = jnp.asarray(irreps_rotation(self.IR1, r), dtype=jnp.float32)
        d2 = jnp.asarray(irreps_rotation(self.IR2, r), dtype=jnp.float32)
        do = irreps_rotation(self.IRO, r)
        out_r = np.asarray(plan.apply(x1 @ d1.T, x2 @ d2.T, w))
        np.testing.assert_allclose(out_r, out @ do.T, atol=1e-4)

    def test_uvu_equivariance_and_sorted_outputs(self):
        rng = np.random.default_rng(6)
        plan = uvu_tp_plan(self.IR1, self.IR2, self.IRO)
        # outputs sorted: same irrep types adjacent
        keys = [mi.ir._key() for mi in plan.irreps_out]
        assert keys == sorted(keys)
        w = jnp.asarray(
            rng.normal(size=(5, plan.weight_numel)), dtype=jnp.float32
        )
        x1 = jnp.asarray(rng.normal(size=(5, self.IR1.dim)), dtype=jnp.float32)
        x2 = jnp.asarray(rng.normal(size=(5, self.IR2.dim)), dtype=jnp.float32)
        out = np.asarray(plan.apply(x1, x2, w))
        r = random_rotation(rng, improper=True)
        d1 = jnp.asarray(irreps_rotation(self.IR1, r), dtype=jnp.float32)
        d2 = jnp.asarray(irreps_rotation(self.IR2, r), dtype=jnp.float32)
        do = irreps_rotation(plan.irreps_out, r)
        out_r = np.asarray(plan.apply(x1 @ d1.T, x2 @ d2.T, w))
        np.testing.assert_allclose(out_r, out @ do.T, atol=1e-4)

    def test_apply_scalar_dense_matches_apply(self):
        """Dense block-diagonal FCTP formulation == per-path einsums."""
        import jax

        rng = np.random.default_rng(11)
        attrs_ir = Irreps("5x0e")
        plan = fully_connected_tp_plan(self.IR1, attrs_ir, self.IR1)
        x = jnp.asarray(rng.normal(size=(7, self.IR1.dim)), dtype=jnp.float32)
        oh = jax.nn.one_hot(
            jnp.asarray(rng.integers(0, 5, 7)), 5, dtype=jnp.float32
        )
        # one padded row (all-zero one-hot) must yield zeros in both
        oh = oh.at[3].set(0.0)
        w = jnp.asarray(rng.normal(size=(plan.weight_numel,)), dtype=jnp.float32)
        a = np.asarray(plan.apply(x, oh, w))
        b = np.asarray(plan.apply_scalar_dense(x, oh, w))
        np.testing.assert_allclose(a, b, atol=1e-5)
        np.testing.assert_allclose(b[3], 0.0)

    def test_apply_onehot2_matches_masked_apply(self):
        """Indexed weight-table gather == plain one-hot contraction with
        padded rows masked (the r5 conv default for S >= 16 swaps the
        gather for the masked apply; both must stay exact)."""
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(13)
        S = 21
        attrs_ir = Irreps(f"{S}x0e")
        irreps = Irreps("8x0e+4x1o+2x2e")
        plan = fully_connected_tp_plan(irreps, attrs_ir, irreps)
        x = jnp.asarray(rng.normal(size=(9, irreps.dim)), dtype=jnp.float32)
        idx = jnp.asarray(rng.integers(0, S, 9))
        mask = jnp.asarray(rng.integers(0, 2, 9), dtype=bool)
        w = jnp.asarray(rng.normal(size=(plan.weight_numel,)), dtype=jnp.float32)
        oh = jax.nn.one_hot(idx, S, dtype=jnp.float32)
        ref = np.asarray(plan.apply(x, oh, w)) * np.asarray(mask)[:, None]
        got = np.asarray(plan.apply_onehot2(x, idx, w, mask=mask))
        np.testing.assert_allclose(ref, got, atol=1e-5)

    def test_apply_scalar_matmul_matches_apply(self):
        """Plain-matmul FCTP reformulation == per-path einsums (any x2)."""
        import jax

        rng = np.random.default_rng(12)
        attrs_ir = Irreps("5x0e")
        # multiple in-entries feeding the same out irrep + an out entry
        # with no incoming path exercise the grouping/zero-fill logic
        irreps_in = Irreps("8x0e+4x1o+2x2e")
        irreps_out = Irreps("6x0e+4x1o+3x2e+2x3o")
        plan = fully_connected_tp_plan(irreps_in, attrs_ir, irreps_out)
        x = jnp.asarray(rng.normal(size=(7, irreps_in.dim)), dtype=jnp.float32)
        oh = jax.nn.one_hot(
            jnp.asarray(rng.integers(0, 5, 7)), 5, dtype=jnp.float32
        )
        oh = oh.at[3].set(0.0)  # padded row -> zeros in both
        w = jnp.asarray(rng.normal(size=(plan.weight_numel,)), dtype=jnp.float32)
        a = np.asarray(plan.apply(x, oh, w))
        b = np.asarray(plan.apply_scalar_matmul(x, oh, w))
        np.testing.assert_allclose(a, b, atol=1e-5)
        np.testing.assert_allclose(b[3], 0.0)
        # generic (non-one-hot) scalar attrs are exact too
        a2 = jnp.asarray(rng.normal(size=(7, 5)), dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(plan.apply(x, a2, w)),
            np.asarray(plan.apply_scalar_matmul(x, a2, w)),
            atol=1e-5,
        )
        # bf16 operand tier stays close
        c = np.asarray(plan.apply_scalar_matmul(x, oh, w, operand_dtype=jnp.bfloat16))
        np.testing.assert_allclose(a, c, atol=0.05, rtol=0.05)

    def test_variance_preservation(self):
        rng = np.random.default_rng(7)
        plan = fully_connected_tp_plan(self.IR1, self.IR2, self.IRO)
        n = 20000
        x1 = jnp.asarray(rng.normal(size=(n, self.IR1.dim)), dtype=jnp.float32)
        x2 = jnp.asarray(rng.normal(size=(n, self.IR2.dim)), dtype=jnp.float32)
        w = jnp.asarray(rng.normal(size=(plan.weight_numel,)), dtype=jnp.float32)
        out = np.asarray(plan.apply(x1, x2, w))
        for s, (_, ir) in zip(plan.irreps_out.slices(), plan.irreps_out):
            v = float(np.var(out[:, s]))
            assert 0.5 < v < 2.0, f"variance {v} for {ir}"

    def test_linear(self):
        rng = np.random.default_rng(8)
        iro = Irreps("3x0e+5x1o")
        lp = LinearPlan(self.IR1, iro)
        w = jnp.asarray(rng.normal(size=(lp.weight_numel,)), dtype=jnp.float32)
        x = jnp.asarray(rng.normal(size=(5, self.IR1.dim)), dtype=jnp.float32)
        out = np.asarray(lp.apply(x, w))
        r = random_rotation(rng, improper=True)
        d1 = jnp.asarray(irreps_rotation(self.IR1, r), dtype=jnp.float32)
        do = irreps_rotation(iro, r)
        out_r = np.asarray(lp.apply(x @ d1.T, w))
        np.testing.assert_allclose(out_r, out @ do.T, atol=1e-5)
        # irreps with no matching input produce zeros
        lp2 = LinearPlan(Irreps("4x1o"), Irreps("2x0e+3x1o"))
        o2 = np.asarray(
            lp2.apply(x[:, :12], jnp.asarray(rng.normal(size=(lp2.weight_numel,)), dtype=jnp.float32))
        )
        np.testing.assert_allclose(o2[:, :2], 0.0)


class TestCartesian:
    def test_elasticity_irreps(self):
        m = cartesian_tensor_map("ijkl=jikl=klij")
        assert str(m.irreps) == "2x0e+2x2e+4e"
        assert m.irreps.dim == 21

    def test_nmr_irreps(self):
        m = cartesian_tensor_map("ij=ji")
        assert str(m.irreps) == "0e+2e"

    def test_antisymmetric(self):
        m = cartesian_tensor_map("ij=-ji")
        assert str(m.irreps) == "1e"

    def test_roundtrip_and_symmetry(self):
        rng = np.random.default_rng(9)
        m = cartesian_tensor_map("ijkl=jikl=klij")
        v = jnp.asarray(rng.normal(size=(4, 21)), dtype=jnp.float32)
        t = np.asarray(m.to_cartesian(v))
        # output obeys the elasticity symmetries
        np.testing.assert_allclose(t, t.transpose(0, 2, 1, 3, 4), atol=1e-6)
        np.testing.assert_allclose(t, t.transpose(0, 1, 2, 4, 3), atol=1e-6)
        np.testing.assert_allclose(t, t.transpose(0, 3, 4, 1, 2), atol=1e-6)
        v2 = np.asarray(m.from_cartesian(jnp.asarray(t)))
        np.testing.assert_allclose(v2, np.asarray(v), atol=1e-5)

    def test_equivariance(self):
        rng = np.random.default_rng(10)
        m = cartesian_tensor_map("ij=ji")
        t = rng.normal(size=(3, 3))
        t = (t + t.T) / 2
        v = np.asarray(m.from_cartesian(jnp.asarray(t)))
        r = random_rotation(rng)
        tr = np.einsum("ai,bj,ij->ab", r, r, t)
        vr = np.asarray(m.from_cartesian(jnp.asarray(tr)))
        d = irreps_rotation(m.irreps, r)
        np.testing.assert_allclose(vr, d @ v, atol=1e-5)
