"""VideoDiffusionRunner — the inference engine around DiT + VAE.

Equivalent of VideoDiffusionInfer (src/core/infer.py:36-373) redesigned for
XLA: the entire denoise step (condition concat -> NaDiT -> CFG -> Euler
endpoint) is one jitted function per (video shape, text length, steps, cfg)
bucket, cached on the runner. VAE scale/shift and latent layout conversions
happen inside the jitted paths; host<->HBM transfers occur only at phase
boundaries.
"""

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.dit.nadit import build_dit_plan, nadit_forward
from ..models.vae.pipeline_vae import VideoVAE
from ..utils.debug import NULL_DEBUG, Debug
from ..utils.dtypes import COMPUTE_DTYPE
from . import diffusion
from .configs import DiTConfig, RunnerConfig


class VideoDiffusionRunner:
    def __init__(
        self,
        dit_params,
        dit_cfg: DiTConfig,
        vae: VideoVAE,
        config: RunnerConfig = RunnerConfig(),
        debug: Debug = NULL_DEBUG,
        encode_tiled: bool = False,
        encode_tile_size: Tuple[int, int] = (512, 512),
        encode_tile_overlap: Tuple[int, int] = (64, 64),
        decode_tiled: bool = False,
        decode_tile_size: Tuple[int, int] = (512, 512),
        decode_tile_overlap: Tuple[int, int] = (64, 64),
        compute_dtype=COMPUTE_DTYPE,
        attention_mode: str = "flash",
    ):
        self.dit_params = dit_params
        self.dit_cfg = dit_cfg
        self.vae = vae
        self.config = config
        self.debug = debug
        self.encode_tiled = encode_tiled
        self.encode_tile_size = encode_tile_size
        self.encode_tile_overlap = encode_tile_overlap
        self.decode_tiled = decode_tiled
        self.decode_tile_size = decode_tile_size
        self.decode_tile_overlap = decode_tile_overlap
        self.compute_dtype = compute_dtype
        self.attention_mode = attention_mode
        self.schedule = diffusion.LerpSchedule(config.diffusion.schedule_T)
        self._denoise_cache: Dict[tuple, callable] = {}
        self.mesh = None

    def attach_mesh(self, mesh):
        """Enable multi-chip data-parallel inference: params replicate across
        the mesh, batches shard over the 'dp' axis. Replaces the reference's
        per-GPU subprocess fan-out (inference_cli.py:1048-1214) with SPMD."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.mesh = mesh
        self.dit_params = jax.device_put(
            self.dit_params, NamedSharding(mesh, P()))
        if self.vae is not None:
            self.vae.params = jax.device_put(
                self.vae.params, NamedSharding(mesh, P()))
            # tile-parallel tiled encode/decode (one tile per chip per wave)
            self.vae.mesh = mesh

    # ----------------------------------------------------------------- vae

    @staticmethod
    def _is_oom(err: Exception) -> bool:
        msg = str(err)
        return ("RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg
                or "Ran out of memory" in msg)

    def vae_encode(self, samples: List[jnp.ndarray]) -> List[jnp.ndarray]:
        """samples: list of (T, H, W, 3) in [-1, 1] -> latents (Tl, h, w, 16)
        scaled by the VAE scaling factor (infer.py:117-188).

        HBM-OOM resilience (the TPU analogue of the reference's retry_on_oom,
        memory_manager.py:350-392): on RESOURCE_EXHAUSTED the call retries
        once with spatial tiling engaged."""
        scale = self.config.vae.scaling_factor
        shift = self.config.vae.shifting_factor
        out = []
        for sample in samples:
            try:
                lat = self.vae.encode(
                    sample[None], tiled=self.encode_tiled,
                    tile_size=self.encode_tile_size,
                    tile_overlap=self.encode_tile_overlap,
                )[0]
            except Exception as e:  # noqa: BLE001
                if not self._is_oom(e) or self.encode_tiled:
                    raise
                self.debug.log(
                    "HBM OOM during VAE encode; retrying with tiling "
                    f"{self.encode_tile_size}", level="WARNING",
                    category="vae", force=True)
                self.encode_tiled = True
                lat = self.vae.encode(
                    sample[None], tiled=True,
                    tile_size=self.encode_tile_size,
                    tile_overlap=self.encode_tile_overlap,
                )[0]
            out.append(((lat.astype(jnp.float32) - shift) * scale)
                       .astype(self.compute_dtype))
        return out

    def vae_decode(self, latents: List[jnp.ndarray]) -> List[jnp.ndarray]:
        scale = self.config.vae.scaling_factor
        shift = self.config.vae.shifting_factor
        out = []
        for lat in latents:
            z = (lat.astype(jnp.float32) / scale + shift)
            try:
                sample = self.vae.decode(
                    z[None].astype(self.vae.dtype), tiled=self.decode_tiled,
                    tile_size=self.decode_tile_size,
                    tile_overlap=self.decode_tile_overlap,
                )[0]
            except Exception as e:  # noqa: BLE001
                if not self._is_oom(e) or self.decode_tiled:
                    raise
                self.debug.log(
                    "HBM OOM during VAE decode; retrying with tiling "
                    f"{self.decode_tile_size}", level="WARNING",
                    category="vae", force=True)
                self.decode_tiled = True
                sample = self.vae.decode(
                    z[None].astype(self.vae.dtype), tiled=True,
                    tile_size=self.decode_tile_size,
                    tile_overlap=self.decode_tile_overlap,
                )[0]
            out.append(sample)
        return out

    # ----------------------------------------------------------- condition

    @staticmethod
    def get_condition(noise: jnp.ndarray, latent_blur: jnp.ndarray,
                      task: str = "sr") -> jnp.ndarray:
        """SR condition: [latent_blur | ones] channel concat (infer.py:54-78)."""
        t = noise.shape[0]
        mask = jnp.ones((*noise.shape[:-1], 1), noise.dtype)
        if task == "sr":
            return jnp.concatenate([latent_blur, mask], axis=-1)
        if task in ("t2v",):
            return jnp.concatenate([jnp.zeros_like(latent_blur), 0 * mask], -1)
        if task == "i2v":
            cond = jnp.concatenate([jnp.zeros_like(latent_blur), 0 * mask], -1)
            first = jnp.concatenate([noise[:1], jnp.ones_like(mask[:1])], -1)
            return cond.at[:1].set(first)
        raise NotImplementedError(task)

    def timestep_transform(self, timesteps, latent_shapes):
        if not self.config.diffusion.timestep_transform:
            return timesteps
        return diffusion.timestep_shift(
            timesteps, latent_shapes, T=self.schedule.T,
            temporal_down=self.config.vae.temporal_downsample_factor,
            spatial_down=self.config.vae.spatial_downsample_factor)

    # ----------------------------------------------------------- inference

    def _denoise_fn(self, vid_shape: Tuple[int, int, int], txt_len_pos: int,
                    txt_len_neg: int, steps: int, cfg_scale: float,
                    cfg_rescale: float):
        key = (vid_shape, txt_len_pos, txt_len_neg, steps, cfg_scale,
               cfg_rescale, self.attention_mode)
        if key in self._denoise_cache:
            return self._denoise_cache[key]
        # trace-time dispatch flag (--attention_mode flash|xla)
        from ..ops.attention import set_attention_mode

        set_attention_mode(self.attention_mode)

        cfg = self.dit_cfg
        plan_pos = build_dit_plan(cfg, vid_shape, txt_len_pos)
        plan_neg = (plan_pos if txt_len_neg == txt_len_pos
                    else build_dit_plan(cfg, vid_shape, txt_len_neg))
        timesteps = diffusion.trailing_timesteps(self.schedule.T, steps)
        schedule = self.schedule
        pred_type = self.config.diffusion.prediction_type

        def f(params, x, cond, txt_pos, txt_neg, t):
            B = x.shape[0]
            vid_in = jnp.concatenate([x, cond], axis=-1)
            tt = jnp.full((B,), t, dtype=jnp.float32)

            def run(txt, plan):
                return nadit_forward(params, cfg, vid_in, txt, tt, plan)

            if cfg_scale == 1.0:
                return run(txt_pos, plan_pos)
            pos = run(txt_pos, plan_pos)
            neg = run(txt_neg, plan_neg)
            return diffusion.classifier_free_guidance(pos, neg, cfg_scale,
                                                      cfg_rescale)

        @jax.jit
        def denoise(params, noise, cond, txt_pos, txt_neg):
            x = noise
            ts = [float(t) for t in timesteps]
            for t, s in zip(ts[:-1], ts[1:]):
                pred = f(params, x, cond, txt_pos, txt_neg, t)
                x = diffusion.euler_step_to(schedule, pred, x, t, s, pred_type)
            pred = f(params, x, cond, txt_pos, txt_neg, ts[-1])
            x0, _ = schedule.convert_from_pred(pred, pred_type, x, ts[-1])
            return x0

        self._denoise_cache[key] = denoise
        return denoise

    def inference(self, noises: List[jnp.ndarray],
                  conditions: List[jnp.ndarray],
                  texts_pos: List[jnp.ndarray], texts_neg: List[jnp.ndarray],
                  cfg_scale: Optional[float] = None,
                  steps: Optional[int] = None) -> List[jnp.ndarray]:
        """One-step (or n-step) denoising of latents (infer.py:293-373).

        noises/conditions: lists of (Tl, h, w, C) latents (same shape within a
        call is batched into one jitted execution)."""
        if not noises:
            return []
        if cfg_scale is None:
            cfg_scale = self.config.diffusion.cfg_scale
        if steps is None:
            steps = self.config.diffusion.sampling_steps

        shapes = {x.shape for x in noises}
        assert len(shapes) == 1, "mixed shapes in one inference call"
        tl, h, w, c = noises[0].shape
        txt_pos = jnp.asarray(texts_pos[0], dtype=self.compute_dtype)
        txt_neg = jnp.asarray(texts_neg[0], dtype=self.compute_dtype)

        fn = self._denoise_fn((tl, h, w), txt_pos.shape[0], txt_neg.shape[0],
                              steps, float(cfg_scale),
                              self.config.diffusion.cfg_rescale)
        noise_b = jnp.stack(noises).astype(self.compute_dtype)
        cond_b = jnp.stack(conditions).astype(self.compute_dtype)
        b = noise_b.shape[0]
        txt_pos_b = jnp.broadcast_to(txt_pos[None], (b, *txt_pos.shape))
        txt_neg_b = jnp.broadcast_to(txt_neg[None], (b, *txt_neg.shape))

        if self.mesh is not None and b % self.mesh.shape.get("dp", 1) == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P

            dp = NamedSharding(self.mesh, P("dp"))
            noise_b = jax.device_put(noise_b, dp)
            cond_b = jax.device_put(cond_b, dp)
            txt_pos_b = jax.device_put(txt_pos_b, dp)
            txt_neg_b = jax.device_put(txt_neg_b, dp)

        out = fn(self.dit_params, noise_b, cond_b, txt_pos_b, txt_neg_b)
        return [out[i] for i in range(b)]
