"""Model-variant smoke tests: scalar targets, norm activation, instance norm."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matten_tpu.data.graph import CrystalGraph, PadSpec, collate_graphs
from matten_tpu.data.structure import Structure
from matten_tpu.models import create_scalar_tensor_model
from matten_tpu.nn.embedding import atomic_number_map

BASE = dict(
    species_embedding_dim=8,
    irreps_edge_sh="0e+1o+2e",
    num_radial_basis=8,
    radial_basis_start=0.0,
    radial_basis_end=5.0,
    radial_basis_type="bessel",
    num_layers=1,
    invariant_layers=1,
    invariant_neurons=8,
    average_num_neighbors=20.0,
    conv_layer_irreps="4x0o+4x0e+2x1o+2x1e+2x2e",
    nonlinearity_type="gate",
    normalization="batch",
    conv_to_output_hidden_irreps_out="4x0e+2x2e+4e",
    output_format="irreps",
    output_formula="ijkl=jikl=klij",
    reduce="mean",
)
DS = dict(allowed_species=[8, 14], average_num_neighbors=20.0, atom_feats_size=None)
SMAP = atomic_number_map((8, 14))


def _data(rng):
    s = Structure(
        lattice=np.eye(3) * 4.0 + rng.normal(size=(3, 3)) * 0.1,
        frac_coords=rng.uniform(0, 1, (4, 3)),
        atomic_numbers=rng.choice([8, 14], 4),
    )
    g = CrystalGraph.from_structure(s, r_cut=5.0)
    data, _ = collate_graphs([g], PadSpec(32, 512, 4), species_map=SMAP)
    return {k: jnp.asarray(v) for k, v in data.items()}


@pytest.mark.parametrize(
    "override,out_dim",
    [
        (dict(output_formula="scalar", conv_to_output_hidden_irreps_out="8x0e"), 1),
        (dict(nonlinearity_type="norm"), 21),
        (dict(normalization="instance"), 21),
        (dict(normalization=None), 21),
        (dict(output_formula="ij=ji"), 6),
    ],
)
def test_variant_builds_and_runs(override, out_dim):
    hp = dict(BASE, **override)
    model = create_scalar_tensor_model(hp, DS)
    rng = np.random.default_rng(0)
    data = _data(rng)
    variables = model.init(jax.random.PRNGKey(0), data)
    out = model.apply(variables, data, use_running_average=True)
    assert out.shape == (4, out_dim)
    assert bool(jnp.isfinite(out).all())


def test_rotation_invariance_of_scalar_model():
    from matten_tpu.ops.wigner import random_rotation

    hp = dict(BASE, output_formula="scalar", conv_to_output_hidden_irreps_out="8x0e")
    model = create_scalar_tensor_model(hp, DS)
    rng = np.random.default_rng(1)
    s = Structure(
        lattice=np.eye(3) * 4.0 + rng.normal(size=(3, 3)) * 0.1,
        frac_coords=rng.uniform(0, 1, (4, 3)),
        atomic_numbers=rng.choice([8, 14], 4),
    )

    def run(struct, variables=None):
        g = CrystalGraph.from_structure(struct, r_cut=5.0)
        data, _ = collate_graphs([g], PadSpec(32, 512, 4), species_map=SMAP)
        data = {k: jnp.asarray(v) for k, v in data.items()}
        if variables is None:
            variables = model.init(jax.random.PRNGKey(0), data)
        return model.apply(variables, data, use_running_average=True), variables

    out, variables = run(s)
    out_r, _ = run(s.rotate(random_rotation(rng)), variables)
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(out_r)[0], atol=1e-5)
