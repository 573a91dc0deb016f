"""Full-VEGS integration: diffusion guidance inside the training loop."""

import jax
import numpy as np

from vegs_tpu.diffusion.pipeline import DiffusionModels
from vegs_tpu.losses.sd_guidance import SDGuidance

import test_training as tt


def test_training_with_sd_guidance(tmp_path, rng):
    info = tt._toy_scene_info(rng)
    tr = tt._make_trainer(tmp_path, rng, info, densify_from_iter=10**9)
    # tiny diffusion stack; window open from iteration 2
    models = DiffusionModels.tiny(jax.random.key(0), image_size=32)
    tr.sd_guidance = SDGuidance(models, guidance_mode="score-matching",
                                start_iter=2, max_iters=30, max_step=50)
    tr.cfg.sd.start_guiding_from_iter = 2
    tr.cfg.sd.end_guiding_at_iter = 30
    tr.cfg.sd.sd_image_size = 32
    tr.cfg.sd.sm_lambda = 1e-6

    seen_guidance = False
    for it in range(1, 8):
        m = tr.train_iteration(it)
        assert np.isfinite(m["loss"])
        if "guidance_loss" in m:
            seen_guidance = True
            assert np.isfinite(m["guidance_loss"])
    assert seen_guidance
