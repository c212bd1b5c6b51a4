"""Utility subsystem tests: anomaly detection, timing, logging, wandb stub."""

import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matten_tpu.utils.anomaly import DetectAnomaly, check_finite
from matten_tpu.utils.logging import get_log_level, set_logger
from matten_tpu.utils.timing import StepTimer, TimeMeter
from matten_tpu.utils.wandb_utils import WandbLogger, write_running_metadata


class TestAnomaly:
    def test_passes_finite(self):
        data = {"a": jnp.ones((3, 3)), "idx": jnp.zeros(3, dtype=jnp.int32)}
        out = DetectAnomaly(label="t")(data)
        assert out is data

    def test_raises_on_nan(self):
        data = {"a": jnp.asarray([1.0, np.nan])}
        with pytest.raises(FloatingPointError, match="'a'"):
            check_finite(data, "layer3")
            jax.effects_barrier()

    def test_under_jit(self):
        @jax.jit
        def f(x):
            check_finite({"x": x}, "jitted")
            return x * 2

        # inside jit the host callback's FloatingPointError surfaces
        # wrapped in a JaxRuntimeError
        with pytest.raises(Exception, match="non-finite values in field 'x'"):
            f(jnp.asarray([np.inf]))
            jax.effects_barrier()


class TestTiming:
    def test_time_meter(self):
        tm = TimeMeter()
        d, c = tm.update()
        assert d >= 0 and c >= 0

    def test_step_timer(self):
        st = StepTimer()
        x = jnp.ones(10)
        with st.step(result_to_block=x, num_edges=100):
            y = x * 2
        assert st.steps == 1 and st.edges == 100
        assert st.edges_per_s > 0


class TestLogging:
    def test_set_logger(self, tmp_path):
        set_logger("DEBUG", filename=str(tmp_path / "t.log"))
        assert get_log_level() == "DEBUG"
        logging.getLogger("x").debug("hello")
        set_logger("INFO", filename=None)
        assert get_log_level() == "INFO"


class TestWandbStub:
    def test_jsonl_fallback(self, tmp_path):
        lg = WandbLogger(project=None, save_dir=str(tmp_path))
        lg.log({"loss": 1.0}, step=0)
        lg.log({"loss": 0.5}, step=1)
        lg.finish()
        lines = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
        assert len(lines) == 2

    def test_metadata(self, tmp_path):
        meta = write_running_metadata(str(tmp_path / "meta.json"))
        assert "hostname" in meta and "cwd" in meta

    def test_restore_by_run_identifier(self, tmp_path):
        """Locate a run's checkpoint dir by its identifier and the latest
        run's `last` checkpoint (reference utils_wandb.py:99-207)."""
        from matten_tpu.utils.wandb_utils import (
            get_wandb_checkpoint_and_identifier_latest,
            get_wandb_checkpoint_path,
            get_wandb_identifier,
            get_wandb_run_path,
        )

        ckpt = tmp_path / "ckpts"
        (ckpt / "last").mkdir(parents=True)
        lg = WandbLogger(project=None, save_dir=str(tmp_path / "logs"),
                         checkpoint_dir=str(ckpt))
        lg.finish()
        rid = lg.run_id
        assert rid
        assert get_wandb_identifier(tmp_path / "logs") == rid
        run_path = get_wandb_run_path(rid, tmp_path)
        assert run_path.endswith(rid)
        assert get_wandb_checkpoint_path(rid, tmp_path) == str(ckpt.resolve())
        last, ident = get_wandb_checkpoint_and_identifier_latest(tmp_path / "logs")
        assert ident == rid
        assert last == str(ckpt.resolve() / "last")
        with pytest.raises(RuntimeError):
            get_wandb_run_path("nonexistent0", tmp_path)
