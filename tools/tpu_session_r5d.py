"""One-process round-5d TPU capture: exp2-domain softmax A/B.

The serving flash kernels are VPU-bound at S~512 windows (40 TF/s,
docs/performance.md); folding log2(e) into the q scale turns every
softmax `exp` into the hardware-native `exp2`, deleting one (bq, bk)
VPU multiply per k-block (ops/flash_attention.py SEEDVR2_FA_EXP2).

Steps:
  1. fa_exp2_ab — DiT 3B serving 1-step denoise, stock exp vs exp2
     (fresh runner per variant; the traced HLO differs so the jit cache
     cannot cross-serve). Anchors: 2.468 s (r5c fa_step), 2.474 s (r5).

CAPTURED (tpu_session_r5d.jsonl): exp 2.480 s (2.470-2.484) vs exp2
2.466 s (2.464-2.471) — exp2 is now the default
(ops/flash_attention.py _EXP2).

Harness discipline (one session, guarded resumable steps, watchdog
exit 3) comes from tools/_session_harness.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _session_harness import SessionHarness, force, reps  # noqa: E402

LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_session_r5d.jsonl"


def fa_exp2_ab():
    import jax
    import jax.numpy as jnp

    from seedvr2_tpu.core.configs import DIT_3B, RunnerConfig
    from seedvr2_tpu.core.runner import VideoDiffusionRunner
    from seedvr2_tpu.models.dit.nadit import init_dit_params
    from seedvr2_tpu.ops import flash_attention as F

    key = jax.random.PRNGKey(0)
    lt, lh, lw, txt_len = 2, 270, 480, 58
    params = init_dit_params(key, DIT_3B, dtype=jnp.bfloat16)
    txt = jax.random.normal(jax.random.fold_in(key, 3),
                            (txt_len, DIT_3B.txt_in_dim), jnp.bfloat16)
    out = {}
    for tag, flag in (("exp", False), ("exp2", True)):
        F._EXP2 = flag
        runner = VideoDiffusionRunner(params, DIT_3B, vae=None,
                                      config=RunnerConfig(dit=DIT_3B))

        def run(i):
            noise = jax.random.normal(
                jax.random.fold_in(key, 2000 + i),
                (lt, lh, lw, DIT_3B.vid_out_channels), jnp.bfloat16)
            blur = jax.random.normal(jax.random.fold_in(key, 3000 + i),
                                     noise.shape, jnp.bfloat16)
            cond = runner.get_condition(noise, blur)
            force(runner.inference(
                noises=[noise], conditions=[cond], texts_pos=[txt],
                texts_neg=[txt], cfg_scale=1.0, steps=1)[0])

        out[tag] = reps(run, 3)
        del runner
    F._EXP2 = os.environ.get("SEEDVR2_FA_EXP2", "1") == "1"
    for leaf in jax.tree.leaves(params):
        try:
            leaf.delete()
        except Exception:  # noqa: BLE001
            pass
    txt.delete()
    return out


def main():
    h = SessionHarness(LOG)
    h.start()
    h.acquire()
    h.guard("fa_exp2_ab", fa_exp2_ab)
    h.done()


if __name__ == "__main__":
    main()
