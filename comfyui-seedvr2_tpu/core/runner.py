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
        encode_tile_size=(512, 512),  # (px, px) tuple or "auto" (memplan)
        encode_tile_overlap: Tuple[int, int] = (64, 64),
        decode_tiled: bool = False,
        decode_tile_size=(512, 512),
        decode_tile_overlap: Tuple[int, int] = (64, 64),
        compute_dtype=COMPUTE_DTYPE,
        attention_mode: str = "flash",
        streamed_dit=None,
        tile_mode: str = "uniform",
    ):
        # tile_mode: "uniform" = even same-shape tile grid (one compile
        # shape, minimal redundant compute; models/vae/pipeline_vae._plan_
        # grid); "ref" = the reference's stride-sweep layout.
        self.tile_mode = tile_mode
        # streamed_dit: ops.offload.StreamedNaDiT for larger-than-HBM models
        # (the reference's BlockSwap); when set, dit_params stays None and
        # the denoise loop streams transformer blocks from host RAM.
        self.streamed_dit = streamed_dit
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
        # resolved plans for tile_size == "auto", keyed (kind, item shape)
        self._auto_tile_cache: Dict[tuple, tuple] = {}
        # PartitionSpec tree for tensor-parallel DiT params (parallel/tp.py);
        # None = params replicated (dp-only inference)
        self.tp_specs = None
        # telemetry: per-call DiT batch sizes (observed by tests/debug to
        # prove the phase-2 dp sharding actually stacks batches)
        self.last_batch_sizes: List[int] = []

    # ------------------------------------------------- phase model offload

    def set_phase_offload(self, dit_host_params):
        """Enable per-phase DiT offload (the TPU equivalent of the
        reference's manage_model_device, memory_manager.py:573-930): the
        DiT weights leave HBM during the VAE phases so the decoder's
        workspace fits, and are re-uploaded from the retained host tree at
        phase-2 entry. Engaged by configure_runner when the resident DiT
        would crowd out the VAE decode at large resolutions."""
        self._dit_host = dit_host_params
        self.phase_offload = True

    @staticmethod
    def _warn_no_tp(tp: int):
        import warnings

        warnings.warn(
            f"tensor parallelism requested (tp={tp}) but the DiT weight "
            f"layout/dims do not shard that many ways — serving replicated "
            f"instead", stacklevel=3)

    def ensure_dit_resident(self):
        if getattr(self, "phase_offload", False) and self.dit_params is None:
            with self.debug.timer("dit_restore", "DiT restore to HBM"):
                if getattr(self, "_tp_on_restore", False):
                    from ..parallel.tp import tp_shard_dit_params

                    self.dit_params, specs = tp_shard_dit_params(
                        self.mesh, self._dit_host, self.dit_cfg)
                    if self.tp_specs is None:
                        self.tp_specs = specs
                        self._denoise_cache.clear()
                elif self.mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    self.dit_params = jax.device_put(
                        self._dit_host, NamedSharding(self.mesh, P()))
                else:
                    self.dit_params = jax.device_put(self._dit_host,
                                                     jax.devices()[0])
                jax.block_until_ready(self.dit_params)

    def release_dit(self):
        """Drop the DiT from HBM (host tree retained). No-op unless phase
        offload is engaged."""
        if getattr(self, "phase_offload", False) and \
                self.dit_params is not None:
            self.dit_params = None

    def attach_mesh(self, mesh):
        """Enable multi-chip inference. Batches shard over the 'dp' axis
        (replacing the reference's per-GPU subprocess fan-out,
        inference_cli.py:1048-1214). When the mesh has a 'tp' axis > 1 and
        the DiT weights divide (any serving layout — dense, w8a8, q8,
        q4k), the DiT serves TENSOR-PARALLEL: attention heads and mlp
        hidden shard over tp (parallel/tp.py — BASELINE config #5, 7B
        HBM-resident on a v5e-8) and the denoise step runs as a shard_map
        with one psum after each row-sharded projection; otherwise params
        replicate (with a warning — the user asked for tp)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.mesh = mesh
        self.tp_specs = None
        self._tp_on_restore = False
        tp = mesh.shape.get("tp", 1)
        if tp > 1:
            from ..parallel.tp import tp_compatible, tp_shard_dit_params

            if self.dit_params is not None:
                if tp_compatible(self.dit_params, self.dit_cfg, tp):
                    self.dit_params, self.tp_specs = tp_shard_dit_params(
                        mesh, self.dit_params, self.dit_cfg)
                    self._denoise_cache.clear()
                else:
                    self._warn_no_tp(tp)
            elif getattr(self, "phase_offload", False):
                # params live on host until phase-2 entry; shard them at
                # each restore (ensure_dit_resident)
                if tp_compatible(self._dit_host, self.dit_cfg, tp):
                    self._tp_on_restore = True
                else:
                    self._warn_no_tp(tp)
            elif self.streamed_dit is not None:
                import warnings

                warnings.warn(
                    f"tensor parallelism (tp={tp}) does not compose with "
                    f"host block streaming — blocks replicate; pass a "
                    f"tensor_parallel that makes the model fit HBM-resident "
                    f"(configure_runner plans per-chip bytes) or drop "
                    f"--blocks_to_swap", stacklevel=2)
        if self.dit_params is not None and self.tp_specs is None:
            self.dit_params = jax.device_put(
                self.dit_params, NamedSharding(mesh, P()))
        if self.streamed_dit is not None:
            # BlockSwap composes with the mesh: blocks replicate, batches
            # shard over dp (ops/offload.StreamedNaDiT.attach_mesh)
            self.streamed_dit.attach_mesh(mesh)
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

    _MIN_TILE = 256

    def _auto_tile_budget(self) -> Optional[int]:
        """HBM bytes available to a VAE phase: chip limit minus whatever
        DiT weights stay resident through it (memplan's probes count the
        VAE params themselves)."""
        from .model_manager import (_hbm_bytes_limit, _per_chip_dit_bytes,
                                    _tree_bytes)

        limit = _hbm_bytes_limit()
        if limit is None:
            return None
        resident = 0
        if (not getattr(self, "phase_offload", False)
                and self.dit_params is not None):
            tp = (self.mesh.shape.get("tp", 1)
                  if self.tp_specs is not None and self.mesh is not None
                  else 1)
            # blocks shard over tp; IO weights replicate
            resident = _per_chip_dit_bytes(self.dit_params, tp)
        sd = self.streamed_dit
        if sd is not None:
            resident += (_tree_bytes(sd.resident) + _tree_bytes(sd.io_params)
                         + 2 * sd.stats.block_bytes)
        return limit - resident

    def _resolve_tile(self, kind: str, item: jnp.ndarray):
        """Resolve ``tile_size == "auto"`` to a concrete plan for this
        input shape via compile-time memory probes (utils/memplan.py).
        ``item`` is one un-stacked sample: (T, H, W, 3) for encode,
        (Tl, h, w, C) for decode. Returns (tiled, tile_size_px)."""
        tiled = getattr(self, f"{kind}_tiled")
        tile_size = getattr(self, f"{kind}_tile_size")
        if tile_size != "auto":
            return tiled, tile_size
        key = (kind, tuple(item.shape))
        hit = self._auto_tile_cache.get(key)
        if hit is not None:
            return hit
        sf = self.config.vae.spatial_downsample_factor
        tdf = self.config.vae.temporal_downsample_factor
        if kind == "decode":
            tl, h, w = item.shape[0], item.shape[1], item.shape[2]
            frames_px = (tl - 1) * tdf + 1
        else:
            frames_px = item.shape[0]
            h = (item.shape[1] + sf - 1) // sf
            w = (item.shape[2] + sf - 1) // sf
        budget = self._auto_tile_budget()
        if budget is None:
            # no memory model for this backend (CPU tests): serve the
            # fixed default so behavior stays deterministic
            resolved = (tiled, (1024, 1024))
            self.debug.log(
                f"auto tile {kind}: no HBM limit for this backend; "
                "using 1024px default", category="memplan")
        else:
            from ..utils import memplan

            plan = memplan.plan_auto_tile(
                self.vae, kind, (h, w), 1, frames_px,
                getattr(self, f"{kind}_tile_overlap"), budget,
                debug=self.debug)
            if plan is None:
                resolved = (False, (1024, 1024))  # untiled fits
            else:
                resolved = (True, plan)
            self.debug.log(
                f"auto tile {kind}: resolved to "
                f"{'untiled' if plan is None else plan} "
                f"(budget {budget / 1e9:.1f} GB)", category="memplan",
                force=True)
        self._auto_tile_cache[key] = resolved
        return resolved

    def _vae_call_with_oom_retry(self, kind: str, run_one,
                                 tiled: Optional[bool] = None,
                                 tile_size=None,
                                 auto_key: Optional[tuple] = None
                                 ) -> jnp.ndarray:
        """HBM-OOM resilience (the TPU analogue of the reference's
        retry_on_oom + memory_limit_conv recursive splitting,
        memory_manager.py:350-392, causal_inflation_lib.py:115-212): on
        RESOURCE_EXHAUSTED first engage spatial tiling, then progressively
        shrink the tile (x0.7 per side, floor 256 px) — at 4K with the DiT
        resident the decoder needs ~<=900^2 tiles on a 16 GB chip.

        A shrink self-heals for later waves/calls: under an "auto" plan it
        updates the per-shape entry in _auto_tile_cache (auto_key), else
        the runner's configured attrs — callers re-resolve per wave."""
        if tiled is None:
            tiled = getattr(self, f"{kind}_tiled")
        if tile_size is None:
            tile_size = getattr(self, f"{kind}_tile_size")
        for _ in range(8):
            try:
                return run_one(tiled, tile_size)
            except Exception as e:  # noqa: BLE001
                if not self._is_oom(e):
                    raise
                if tiled:
                    if min(tile_size) <= self._MIN_TILE:
                        raise
                    tile_size = tuple(
                        max(self._MIN_TILE, int(t * 0.7) // 64 * 64)
                        for t in tile_size)
                tiled = True
                self.debug.log(
                    f"HBM OOM during VAE {kind}; retrying with tiling "
                    f"{tile_size}", level="WARNING", category="vae",
                    force=True)
                if (auto_key is not None
                        and getattr(self, f"{kind}_tile_size") == "auto"):
                    self._auto_tile_cache[auto_key] = (tiled, tile_size)
                else:
                    setattr(self, f"{kind}_tiled", tiled)
                    setattr(self, f"{kind}_tile_size", tile_size)
        raise RuntimeError(f"VAE {kind} kept OOMing down to {tile_size}")

    def _batched_waves(self, items: List[jnp.ndarray], tiled: bool):
        """Temporal parallelism for the VAE phases: batches are
        state-independent by construction (each is 4n+1 mirror-padded and
        encoded/decoded with fresh causal state, matching the reference's
        per-batch loop, generation_phases.py:171+), so same-shape batches
        stack on the batch axis and shard over the mesh 'dp' axis — the
        exact-parity replacement for the reference's per-GPU frame-range
        fan-out AND for its (stubbed) per-conv cache_send_recv halo
        (context_parallel_lib.py:55-67). When tiling is on, parallelism
        comes from the tile axis instead (VideoVAE._tile_map), so waves
        stay size 1. Yields (original_indices, stacked_batch).

        The batch axis shards over EVERY mesh axis (dp AND tp combined):
        the VAE has no tensor parallelism, so a tp extent would otherwise
        idle those chips through both VAE phases."""
        dp = 1
        axes: tuple = ()
        if self.mesh is not None and not tiled:
            axes = tuple(self.mesh.axis_names)
            dp = int(np.prod([self.mesh.shape[a] for a in axes]))
        groups: Dict[tuple, list] = {}
        for i, x in enumerate(items):
            groups.setdefault(tuple(x.shape), []).append(i)
        from ..utils.partition import partition_by_size

        for idxs in groups.values():
            for wave in partition_by_size(idxs, dp):
                pad = (-len(wave)) % dp
                sel = wave + [wave[-1]] * pad
                batch = jnp.stack([items[i] for i in sel])
                if dp > 1:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    batch = jax.device_put(batch,
                                           NamedSharding(self.mesh, P(axes)))
                yield wave, batch

    def vae_encode(self, samples: List[jnp.ndarray]) -> List[jnp.ndarray]:
        """samples: list of (T, H, W, 3) in [-1, 1] -> latents (Tl, h, w, 16)
        scaled by the VAE scaling factor (infer.py:117-188)."""
        scale = self.config.vae.scaling_factor
        shift = self.config.vae.shifting_factor
        out: List[jnp.ndarray] = [None] * len(samples)
        # resolve the tile plan per distinct shape (mixed-shape calls get
        # mixed plans); waves stay size 1 if ANY plan tiles
        plans = {tuple(s.shape): self._resolve_tile("encode", s)
                 for s in samples}
        tiled_any = any(t for t, _ in plans.values())
        for wave, batch in self._batched_waves(samples, tiled_any):
            key = ("encode", tuple(samples[wave[0]].shape))
            enc_tiled, enc_ts = self._resolve_tile("encode",
                                                   samples[wave[0]])
            lat = self._vae_call_with_oom_retry(
                "encode",
                lambda tiled, ts, b=batch: self.vae.encode(
                    b, tiled=tiled, tile_size=ts,
                    tile_overlap=self.encode_tile_overlap,
                    tile_mode=self.tile_mode),
                tiled=enc_tiled, tile_size=enc_ts, auto_key=key)
            lat = ((lat.astype(jnp.float32) - shift) * scale).astype(
                self.compute_dtype)
            for j, i in enumerate(wave):
                out[i] = lat[j]
        return out

    def vae_decode(self, latents: List[jnp.ndarray]) -> List[jnp.ndarray]:
        scale = self.config.vae.scaling_factor
        shift = self.config.vae.shifting_factor
        zs = [(jnp.asarray(lat).astype(jnp.float32) / scale + shift)
              .astype(self.vae.dtype) for lat in latents]
        out: List[jnp.ndarray] = [None] * len(latents)
        plans = {tuple(z.shape): self._resolve_tile("decode", z)
                 for z in zs}
        tiled_any = any(t for t, _ in plans.values())
        for wave, batch in self._batched_waves(zs, tiled_any):
            key = ("decode", tuple(zs[wave[0]].shape))
            dec_tiled, dec_ts = self._resolve_tile("decode", zs[wave[0]])
            sample = self._vae_call_with_oom_retry(
                "decode",
                lambda tiled, ts, b=batch: self.vae.decode(
                    b, tiled=tiled, tile_size=ts,
                    tile_overlap=self.decode_tile_overlap,
                    tile_mode=self.tile_mode),
                tiled=dec_tiled, tile_size=dec_ts, auto_key=key)
            for j, i in enumerate(wave):
                out[i] = sample[j]
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
               cfg_rescale, self.attention_mode, self.tp_specs is not None)
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

        if self.streamed_dit is not None:
            # BlockSwap path: the block loop runs at the host level (each
            # block is its own jitted fn; ops/offload.py), so the denoise
            # loop is host-driven too — the small Euler/CFG algebra between
            # DiT calls is plain jnp ops.
            sd = self.streamed_dit

            def streamed_f(x, cond, txt_pos, txt_neg, t):
                vid_in = jnp.concatenate([x, cond], axis=-1)
                tt = jnp.full((x.shape[0],), t, dtype=jnp.float32)
                pos = sd(vid_in, txt_pos, tt, plan_pos)
                if cfg_scale == 1.0:
                    return pos
                neg = sd(vid_in, txt_neg, tt, plan_neg)
                return diffusion.classifier_free_guidance(
                    pos, neg, cfg_scale, cfg_rescale)

            def streamed_denoise(params, noise, cond, txt_pos, txt_neg):
                del params  # weights live inside streamed_dit
                x = noise
                ts = [float(t) for t in timesteps]
                for t, s in zip(ts[:-1], ts[1:]):
                    pred = streamed_f(x, cond, txt_pos, txt_neg, t)
                    x = diffusion.euler_step_to(schedule, pred, x, t, s,
                                                pred_type)
                pred = streamed_f(x, cond, txt_pos, txt_neg, ts[-1])
                x0, _ = schedule.convert_from_pred(pred, pred_type, x, ts[-1])
                return x0

            self._denoise_cache[key] = streamed_denoise
            return streamed_denoise

        def f(params, x, cond, txt_pos, txt_neg, t):
            B = x.shape[0]
            vid_in = jnp.concatenate([x, cond], axis=-1)
            tt = jnp.full((B,), t, dtype=jnp.float32)

            if self.tp_specs is not None:
                from jax.sharding import PartitionSpec as P

                dp = self.mesh.shape.get("dp", 1)
                b_ax = "dp" if (dp > 1 and B % dp == 0) else None

                def run(txt, plan):
                    def fwd(prm, v, tx, ts):
                        return nadit_forward(prm, cfg, v, tx, ts, plan,
                                             tp_axis="tp")

                    return jax.shard_map(
                        fwd, mesh=self.mesh,
                        in_specs=(self.tp_specs,
                                  P(b_ax, None, None, None, None),
                                  P(b_ax, None, None), P(b_ax)),
                        out_specs=P(b_ax, None, None, None, None),
                        check_vma=False,
                    )(params, vid_in, txt, tt)
            else:
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
        self.ensure_dit_resident()
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
        self.last_batch_sizes.append(b)
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
