"""Generate convention-freeze goldens (tests/goldens/conventions.npz).

Round-1 VERDICT missing #6: nothing locked the framework's O(3) conventions
(CG signs, l=1 basis order, SH normalization, Cartesian basis ordering,
path-weight normalization) against silent drift. Reference-checkpoint
activation parity is impossible in this environment (the published
checkpoint file does not exist and torch/e3nn are absent), so these
recorded values ARE the convention contract: any change to
ops/wigner.py, ops/spherical_harmonics.py, ops/cartesian.py,
ops/tensor_product.py or the model assembly that alters numerics fails
tests/ops/test_goldens.py.

Regenerate ONLY for a deliberate, documented convention change:
    python devtools/make_goldens.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_matmul_precision", "highest")

OUT = Path(__file__).resolve().parent.parent / "tests" / "goldens" / "conventions.npz"


def build():
    import jax.numpy as jnp

    from matten_tpu.models import create_scalar_tensor_model
    from matten_tpu.ops.cartesian import cartesian_tensor_map
    from matten_tpu.ops.irreps import Irreps
    from matten_tpu.ops.spherical_harmonics import spherical_harmonics
    from matten_tpu.ops.tensor_product import uvu_tp_plan
    from matten_tpu.ops.wigner import wigner_3j

    out = {}

    # 1. Wigner 3j tables (CG signs + l=1 (x,y,z) basis)
    for l1, l2, l3 in [(1, 1, 0), (1, 1, 1), (1, 1, 2), (2, 1, 1), (2, 2, 4), (3, 4, 2), (4, 4, 0)]:
        out[f"w3j_{l1}{l2}{l3}"] = np.asarray(wigner_3j(l1, l2, l3))

    # 2. real spherical harmonics at fixed directions, component norm
    rng = np.random.default_rng(20260819)
    vecs = rng.normal(size=(8, 3)).astype(np.float32)
    out["sh_vecs"] = vecs
    out["sh_lmax4"] = np.asarray(
        spherical_harmonics(
            Irreps("0e+1o+2e+3o+4e"), jnp.asarray(vecs), normalize=True,
            normalization="component",
        )
    )

    # 3. Cartesian <-> irreps change of basis (elasticity + rank-2 symmetric)
    out["cart_elastic"] = np.asarray(cartesian_tensor_map("ijkl=jikl=klij").basis)
    out["cart_nmr"] = np.asarray(cartesian_tensor_map("ij=ji").basis)

    # 4. uvu plan: path weights + one weighted product evaluation
    plan = uvu_tp_plan(
        Irreps("4x0e+4x0o+2x1o+2x1e+1x2e"), Irreps("0e+1o+2e"),
        Irreps("4x0e+4x0o+2x1o+2x1e+1x2e"),
    )
    out["uvu_path_weights"] = np.asarray(plan.path_weights)
    x1 = rng.normal(size=(5, plan.irreps_in1.dim)).astype(np.float32)
    x2 = rng.normal(size=(5, plan.irreps_in2.dim)).astype(np.float32)
    w = rng.normal(size=(5, plan.weight_numel)).astype(np.float32)
    out["uvu_x1"], out["uvu_x2"], out["uvu_w"] = x1, x2, w
    out["uvu_out"] = np.asarray(plan.apply(jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(w)))

    # 5. full-model forward for a fixed seed + synthetic batch (locks the
    # assembly: normalization factors, gate wiring, readout ordering)
    from matten_tpu.data.graph import CrystalGraph, PadSpec, collate_graphs
    from matten_tpu.data.structure import Structure
    from matten_tpu.nn.embedding import atomic_number_map

    hparams = dict(
        species_embedding_dim=8,
        irreps_edge_sh="0e+1o+2e+3o+4e",
        num_radial_basis=8,
        radial_basis_start=0.0,
        radial_basis_end=5.0,
        radial_basis_type="bessel",
        num_layers=2,
        invariant_layers=2,
        invariant_neurons=8,
        average_num_neighbors=20.0,
        conv_layer_irreps="4x0o+4x0e+2x1o+2x1e+1x2o+1x2e+1x3o+1x3e+1x4e",
        nonlinearity_type="gate",
        normalization="batch",
        conv_to_output_hidden_irreps_out="4x0e+2x2e+4e",
        output_format="irreps",
        output_formula="ijkl=jikl=klij",
        reduce="mean",
    )
    model = create_scalar_tensor_model(
        hparams,
        dict(allowed_species=[8, 14], average_num_neighbors=20.0, atom_feats_size=None),
    )
    graphs = []
    for _ in range(3):
        s = Structure(
            lattice=np.eye(3) * 4.0 + rng.normal(size=(3, 3)) * 0.2,
            frac_coords=rng.uniform(0, 1, size=(4, 3)),
            atomic_numbers=rng.choice([8, 14], size=4),
        )
        g = CrystalGraph.from_structure(s, r_cut=5.0)
        g.y["elastic_tensor_full"] = rng.normal(size=(1, 21))
        graphs.append(g)
    smap = atomic_number_map((8, 14))
    data, _ = collate_graphs(graphs, PadSpec(16, 512, 4), species_map=smap)
    data = {k: jnp.asarray(v) for k, v in data.items()}
    variables = model.init(jax.random.PRNGKey(20260819), data)
    out["model_out"] = np.asarray(
        model.apply(variables, data, use_running_average=True)
    )
    # per-layer node features (first conv layer) for diagnosis granularity
    _, inter = model.apply(
        variables, data, use_running_average=True,
        capture_intermediates=lambda mdl, name: name == "__call__",
    )
    feats = inter["intermediates"]["backbone"]["layers_3"]["__call__"][0][
        "node_features"
    ]
    out["layer0_node_features"] = np.asarray(feats)
    # the batch inputs, so the test replays the same arrays
    for k, v in data.items():
        out[f"in_{k}"] = np.asarray(v)
    return out


def main():
    out = build()
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} ({len(out)} arrays)")


if __name__ == "__main__":
    main()
