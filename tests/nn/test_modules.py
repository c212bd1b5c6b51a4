"""Unit tests for equivariant nn modules (gate, norms, embeddings, conv)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matten_tpu.data import keys as K
from matten_tpu.nn.common import freeze_irreps
from matten_tpu.nn.conv import PointConv
from matten_tpu.nn.embedding import atomic_number_map
from matten_tpu.nn.gate import ActivationInfo
from matten_tpu.nn.norm import IrrepsBatchNorm
from matten_tpu.nn.radial import ScalarMLP, bessel_basis, normalize2mom
from matten_tpu.ops.irreps import Irreps
from matten_tpu.ops.wigner import irreps_rotation, random_rotation


class TestActivationInfo:
    def test_gate_layout(self):
        info = ActivationInfo(
            Irreps("16x0e+8x1o"),
            Irreps("0e+1o+2e"),
            Irreps("8x0o+8x0e+4x1o+4x1e"),
        )
        # 0o not producible from these inputs (parities: e*e=e, e|o chains)
        assert str(info.irreps_scalars) == "8x0e"
        assert str(info.irreps_gated) == "4x1o+4x1e"
        assert str(info.irreps_gates) == "8x0e"
        assert info.irreps_in.dim == 8 + 8 + 4 * 3 * 2
        assert str(info.irreps_out) == "8x0e+4x1o+4x1e"

    def test_gate_equivariance(self):
        rng = np.random.default_rng(0)
        info = ActivationInfo(
            Irreps("16x0e+16x0o+8x1o"),
            Irreps("0e+1o+2e"),
            Irreps("8x0o+8x0e+4x1o+4x1e"),
        )
        gate = info.make()
        x = jnp.asarray(rng.normal(size=(7, info.irreps_in.dim)), dtype=jnp.float32)
        y = np.asarray(gate(x))
        for improper in (False, True):
            r = random_rotation(rng, improper=improper)
            din = jnp.asarray(irreps_rotation(info.irreps_in, r), dtype=jnp.float32)
            dout = irreps_rotation(info.irreps_out, r)
            yr = np.asarray(gate(x @ din.T))
            np.testing.assert_allclose(yr, y @ dout.T, atol=1e-5)

    def test_gate_second_moment(self):
        # unit-variance input -> roughly unit-variance output
        rng = np.random.default_rng(1)
        info = ActivationInfo(
            Irreps("16x0e+8x1o"), Irreps("0e+1o+2e"), Irreps("8x0e+4x1o")
        )
        gate = info.make()
        x = jnp.asarray(rng.normal(size=(50000, info.irreps_in.dim)), dtype=jnp.float32)
        y = np.asarray(gate(x))
        m2 = (y**2).mean()
        assert 0.5 < m2 < 1.5, m2


class TestBatchNorm:
    def test_masked_stats_ignore_padding(self):
        rng = np.random.default_rng(2)
        irreps = Irreps("4x0e+2x1o")
        bn = IrrepsBatchNorm(irreps=irreps)
        x_real = rng.normal(size=(10, irreps.dim)) * 3 + 1
        x_pad = rng.normal(size=(6, irreps.dim)) * 100  # garbage in padding
        mask = jnp.asarray([True] * 10 + [False] * 6)
        x = jnp.asarray(np.concatenate([x_real, x_pad]), dtype=jnp.float32)
        vars0 = bn.init(jax.random.PRNGKey(0), x, mask=mask)
        y, updates = bn.apply(vars0, x, mask=mask, mutable=["batch_stats"])
        y = np.asarray(y)
        # real-node scalars are standardized regardless of padding garbage
        assert abs(y[:10, :4].mean()) < 0.2
        assert 0.5 < y[:10, :4].std() < 1.5
        # identical input with different padding -> identical real outputs
        x2 = jnp.asarray(np.concatenate([x_real, x_pad * 0 + 7]), dtype=jnp.float32)
        y2, _ = bn.apply(vars0, x2, mask=mask, mutable=["batch_stats"])
        np.testing.assert_allclose(y[:10], np.asarray(y2)[:10], atol=1e-6)

    def test_running_average_used_in_eval(self):
        rng = np.random.default_rng(3)
        irreps = Irreps("2x0e")
        bn = IrrepsBatchNorm(irreps=irreps)
        x = jnp.asarray(rng.normal(size=(50, 2)) * 5 + 3, dtype=jnp.float32)
        variables = bn.init(jax.random.PRNGKey(0), x)
        # several training steps update running stats
        bs = variables["batch_stats"]
        for _ in range(200):
            _, upd = bn.apply(
                {"params": variables["params"], "batch_stats": bs},
                x,
                mutable=["batch_stats"],
            )
            bs = upd["batch_stats"]
        y_eval = np.asarray(
            bn.apply(
                {"params": variables["params"], "batch_stats": bs},
                x,
                use_running_average=True,
            )
        )
        assert abs(y_eval.mean()) < 0.1
        assert 0.8 < y_eval.std() < 1.2

    def test_equivariance(self):
        rng = np.random.default_rng(4)
        irreps = Irreps("4x0e+2x1o+2x2e")
        bn = IrrepsBatchNorm(irreps=irreps)
        x = jnp.asarray(rng.normal(size=(20, irreps.dim)), dtype=jnp.float32)
        variables = bn.init(jax.random.PRNGKey(0), x)
        y, _ = bn.apply(variables, x, mutable=["batch_stats"])
        r = random_rotation(rng)
        d = jnp.asarray(irreps_rotation(irreps, r), dtype=jnp.float32)
        yr, _ = bn.apply(variables, x @ d.T, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(yr), np.asarray(y) @ np.asarray(d).T, atol=1e-5)


class TestRadial:
    def test_bessel_window(self):
        x = jnp.asarray([0.0, 2.5, 4.99, 5.01, 7.0])
        b = np.asarray(bessel_basis(x, 8, 0.0, 5.0))
        assert b.shape == (5, 8)
        np.testing.assert_allclose(b[0], 0.0)  # zero length (dummy edge)
        np.testing.assert_allclose(b[3], 0.0)  # beyond cutoff
        np.testing.assert_allclose(b[4], 0.0)
        assert np.abs(b[1]).max() > 0

    def test_normalize2mom(self):
        rng = np.random.default_rng(5)
        z = jnp.asarray(rng.normal(size=(200000,)), dtype=jnp.float32)
        for name in ("ssp", "silu", "sigmoid", "tanh", "abs"):
            y = np.asarray(normalize2mom(name)(z))
            assert abs((y**2).mean() - 1.0) < 0.02, name

    def test_scalar_mlp_variance(self):
        rng = np.random.default_rng(6)
        mlp = ScalarMLP(hs=(8, 32, 32, 54), act="silu")
        x = jnp.asarray(rng.normal(size=(10000, 8)), dtype=jnp.float32)
        variables = mlp.init(jax.random.PRNGKey(0), x)
        y = np.asarray(mlp.apply(variables, x))
        assert 0.3 < (y**2).mean() < 3.0


class TestSpeciesMap:
    def test_non_consecutive(self):
        table = atomic_number_map((8, 22, 56))
        assert table[8] == 0 and table[22] == 1 and table[56] == 2
        assert table[1] == -1


class TestPointConv:
    def _toy_data(self, rng, irreps_feats, irreps_attrs, irreps_sh):
        n, e = 6, 20
        src = rng.integers(0, n, e)
        dst = rng.integers(0, n, e)
        data = {
            K.NODE_FEATURES: jnp.asarray(
                rng.normal(size=(n, irreps_feats.dim)), dtype=jnp.float32
            ),
            K.NODE_ATTRS: jnp.asarray(
                rng.normal(size=(n, irreps_attrs.dim)), dtype=jnp.float32
            ),
            K.EDGE_ATTRS: jnp.asarray(
                rng.normal(size=(e, irreps_sh.dim)), dtype=jnp.float32
            ),
            K.EDGE_EMBEDDING: jnp.asarray(
                rng.normal(size=(e, 8)), dtype=jnp.float32
            ),
            K.EDGE_INDEX: jnp.asarray(np.stack([src, dst]).astype(np.int32)),
            K.NUM_NEIGH: jnp.asarray(np.bincount(src, minlength=n), dtype=jnp.float32),
        }
        return data

    def test_equivariance(self):
        rng = np.random.default_rng(7)
        feats = Irreps("8x0e+4x1o")
        attrs = Irreps("3x0e")
        sh = Irreps("0e+1o+2e")
        out_ir = Irreps("8x0e+4x1o+4x1e+2x2e")
        conv = PointConv(
            irreps_in=freeze_irreps(
                {K.NODE_FEATURES: feats, K.NODE_ATTRS: attrs, K.EDGE_ATTRS: sh}
            ),
            conv_layer_irreps=out_ir,
            avg_num_neighbors=3.0,
        )
        data = self._toy_data(rng, feats, attrs, sh)
        variables = conv.init(jax.random.PRNGKey(0), data)
        out = np.asarray(conv.apply(variables, data)[K.NODE_FEATURES])
        r = random_rotation(rng, improper=True)
        data_r = dict(data)
        for key, ir in ((K.NODE_FEATURES, feats), (K.EDGE_ATTRS, sh)):
            d = jnp.asarray(irreps_rotation(ir, r), dtype=jnp.float32)
            data_r[key] = data[key] @ d.T
        out_r = np.asarray(conv.apply(variables, data_r)[K.NODE_FEATURES])
        do = irreps_rotation(out_ir, r)
        np.testing.assert_allclose(out_r, out @ do.T, atol=1e-4)


class TestNodewiseReduce:
    """Masked min/max graph pooling (reference nn/nodewise.py:120-148)."""

    def _run(self, reduce):
        from matten_tpu.nn.nodewise import NodewiseReduce

        x = jnp.asarray(
            np.array(
                [[1.0, -2.0], [3.0, 0.5], [99.0, -99.0], [-4.0, 7.0], [2.0, 2.0]],
                dtype=np.float32,
            )
        )
        batch = jnp.asarray([0, 0, 0, 1, 1], dtype=jnp.int32)
        mask = jnp.asarray([1, 1, 0, 1, 1], dtype=jnp.bool_)  # node 2 is dummy
        data = {
            K.NODE_FEATURES: x,
            K.BATCH: batch,
            K.CELL: jnp.zeros((2, 3, 3)),
            K.NODE_MASK: mask,
        }
        m = NodewiseReduce(
            irreps_in=freeze_irreps({K.NODE_FEATURES: Irreps("2x0e")}),
            reduce=reduce,
        )
        variables = m.init(jax.random.PRNGKey(0), data)
        return np.asarray(m.apply(variables, data)[f"{reduce}_{K.NODE_FEATURES}"])

    def test_min_ignores_masked(self):
        out = self._run("min")
        np.testing.assert_allclose(out, [[1.0, -2.0], [-4.0, 2.0]])

    def test_max_ignores_masked(self):
        out = self._run("max")
        np.testing.assert_allclose(out, [[3.0, 0.5], [2.0, 7.0]])
