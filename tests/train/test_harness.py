"""Training harness tests: loss decreases, checkpoints round-trip, predict API."""

import os

import numpy as np
import pytest

from matten_tpu.data.datamodule import BatchLoader, TensorDataModule
from matten_tpu.data.dataset import DatasetStatistics, TensorDatasetConfig
from matten_tpu.data.graph import CrystalGraph
from matten_tpu.data.structure import Structure
from matten_tpu.models import create_scalar_tensor_model
from matten_tpu.nn.embedding import atomic_number_map
from matten_tpu.train import CanonicalRegressionTask, Trainer, TrainerConfig
from matten_tpu.train.checkpoint import save_sidecar

HPARAMS = dict(
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


def _random_structure(rng, n_atoms=4):
    return Structure(
        lattice=np.eye(3) * 4.0 + rng.normal(size=(3, 3)) * 0.2,
        frac_coords=rng.uniform(0, 1, size=(n_atoms, 3)),
        atomic_numbers=rng.choice([8, 14], size=n_atoms),
    )


class _FakeDataModule:
    """Minimal datamodule over synthetic graphs."""

    def __init__(self, rng, n=8):
        cfg = TensorDatasetConfig()
        self.cfg = cfg
        graphs = []
        for _ in range(n):
            s = _random_structure(rng)
            g = CrystalGraph.from_structure(s, r_cut=5.0)
            g.y["elastic_tensor_full"] = rng.normal(size=(1, 21))
            graphs.append(g)
        self.graphs = {"train": graphs, "val": graphs, "test": graphs}
        self.statistics = DatasetStatistics.compute(graphs, cfg)
        self.species_map = atomic_number_map(self.statistics.allowed_species)

    def _loader(self, split, shuffle):
        return BatchLoader(
            self.graphs[split], batch_size=4, species_map=self.species_map,
            shuffle=shuffle, node_multiple=32, edge_multiple=256,
        )

    def train_dataloader(self):
        return self._loader("train", True)

    def val_dataloader(self):
        return self._loader("val", False)

    def test_dataloader(self):
        return self._loader("test", False)

    def get_to_model_info(self):
        return {
            "allowed_species": list(self.statistics.allowed_species),
            "average_num_neighbors": self.statistics.average_num_neighbors,
            "atom_feats_size": None,
        }


class TestTrainer:
    def test_loss_decreases_and_overfits(self):
        rng = np.random.default_rng(0)
        dm = _FakeDataModule(rng)
        model = create_scalar_tensor_model(HPARAMS, dm.get_to_model_info())
        task = CanonicalRegressionTask(name="elastic_tensor_full")
        trainer = Trainer(model, [task], TrainerConfig(max_epochs=10, lr=0.02))
        state = trainer.init_state(next(iter(dm.train_dataloader())))
        state = trainer.fit(state, dm)
        losses = [h["train/loss"] for h in trainer.history]
        assert losses[-1] < losses[0] * 0.9, losses

    def test_lr_plateau_and_early_stop_logic(self):
        from matten_tpu.train.trainer import ReduceLROnPlateau

        s = ReduceLROnPlateau(factor=0.5, patience=2)
        assert not s.step(1.0)
        assert not s.step(1.1)  # bad 1
        assert not s.step(1.1)  # bad 2
        assert s.step(1.1)  # bad 3 > patience -> reduce
        assert s.scale == 0.5
        assert not s.step(0.5)  # improvement resets

    def test_checkpoint_roundtrip_and_predict(self, tmp_path):
        import jax

        rng = np.random.default_rng(1)
        dm = _FakeDataModule(rng)
        model = create_scalar_tensor_model(HPARAMS, dm.get_to_model_info())
        task = CanonicalRegressionTask(name="elastic_tensor_full")
        ckpt_dir = tmp_path / "ckpt"
        trainer = Trainer(
            model, [task],
            TrainerConfig(max_epochs=2, lr=0.01, checkpoint_dir=str(ckpt_dir)),
        )
        state = trainer.init_state(next(iter(dm.train_dataloader())))
        save_sidecar(
            ckpt_dir,
            hparams={
                "model": HPARAMS,
                "data": {"r_cut": 5.0, "tensor_target_name": "elastic_tensor_full"},
                "dataset_hparams": dm.get_to_model_info(),
                "normalize_tensor_target": False,
            },
            statistics_arrays=dm.statistics.to_arrays(),
        )
        state = trainer.fit(state, dm)

        # restore best checkpoint into a fresh template
        template = trainer.init_state(next(iter(dm.train_dataloader())), rng_seed=7)
        restored = trainer._ckpt_manager.restore(template)
        p0 = jax.tree.leaves(state.params)[0]
        r0 = jax.tree.leaves(restored.params)[0]
        assert p0.shape == r0.shape

        # predict API end-to-end from the checkpoint dir
        from matten_tpu.predict import predict

        s = _random_structure(np.random.default_rng(3))
        t = predict(s, ckpt_dir)
        assert t is not None and t.shape == (3, 3, 3, 3)
        np.testing.assert_allclose(t, np.transpose(t, (1, 0, 2, 3)), atol=1e-4)

        # species check raises for unsupported species
        bad = Structure(np.eye(3) * 4, [[0, 0, 0], [0.5, 0.5, 0.5]], [79, 79])
        with pytest.raises(ValueError, match="not trained"):
            predict(bad, ckpt_dir)
