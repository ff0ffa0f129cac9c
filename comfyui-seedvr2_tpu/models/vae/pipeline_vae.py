"""VideoVAE: slicing + tiled encode/decode orchestration over the functional
encoder/decoder cores.

Reimplements the reference wrapper behavior
(attn_video_vae.py slicing_encode:1246 / slicing_decode:1270 /
tiled_encode:1294 / tiled_decode:1462, VideoAutoencoderKLWrapper:1652):

 - temporal slicing: frame 0 + 4-frame groups (latent: 2 then 1), with the
   causal-conv tail state threaded between slices (replacing the reference's
   mutable conv memory);
 - spatial tiling with cosine-ramp separable fade masks, accumulate/normalize;
 - latent = posterior mode = first 16 channels of the encoder moments.

Data layout is channels-last: video (B, T, H, W, 3) in [-1, 1], latent
(B, Tl, h, w, 16). Per-shape jit caching is handled by jax.jit itself; the
slice/tile loops run host-side (cheap control, heavy compute jitted).
"""

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core.configs import VAEConfig
from .model import decoder_core, encoder_core


def _cos_ramp(n: int) -> np.ndarray:
    t = np.linspace(0.0, 1.0, n, dtype=np.float32)
    return 0.5 - 0.5 * np.cos(t * np.pi)


def _fade_weights(length: int, overlap: int, at_start: bool, at_end: bool) -> np.ndarray:
    """Separable fade profile (attn_video_vae.py:1419-1439)."""
    wgt = np.ones((length,), dtype=np.float32)
    ov = max(0, min(overlap, length - 1))
    if ov > 0:
        ramp = _cos_ramp(overlap)[:ov]
        if at_start:
            wgt[:ov] = ramp
        if at_end:
            wgt[-ov:] = 1.0 - ramp
    return wgt


def _even_starts(total: int, tile: int, n: int):
    if n == 1:
        return [0]
    return [round(i * (total - tile) / (n - 1)) for i in range(n)]


def _min_overlap(starts, tile):
    if len(starts) < 2:
        return 0
    return min(starts[i] + tile - starts[i + 1]
               for i in range(len(starts) - 1))


def _tile_cost_aspect(n_tiles: int, th: int, tw: int) -> float:
    """Empirical v5e DECODE wall-time model for one uniform grid.

    Measured (tools/tile_probe.py probe_aspect, 4K serving shape, r4
    capture): per-area decode time grows with tile HEIGHT — 7.9e-5
    s/latent-px at th=74 vs 10.9e-5 at th=139, while tw is nearly free
    (74x166 and 74x244 tiles run at the same per-area rate). Fit:
    t_tile ~ th*tw*(th + 250), plus a fixed per-tile term worth ~0.04 s
    that stops the model from shredding the image into slivers. Ranks
    the measured 4K grids correctly at the top: (4,2)=11.47 s <
    (4,3)=11.55 < (5,2)=11.96 < (3,3)=12.49 < (2,4)=15.22."""
    return float(n_tiles) * (float(th) * tw * (th + 250) + 600_000.0)


def _plan_grid(h: int, w: int, cap_area: int, ov_h: int, ov_w: int,
               force_grid=None, cost: str = "area"):
    """Uniform tile-grid planning: evenly-spaced SAME-SHAPE (th x tw) tiles
    covering h x w with th*tw <= cap_area and overlaps >= the requested
    minimums, minimizing total tile area (= redundant compute) when
    cost="area", or the measured v5e decode wall-time model when
    cost="aspect" (_tile_cost_aspect: equal-area decode tiles differ
    ~30% in wall time by aspect, so the decoder plans by the fitted
    model; the encoder keeps the area cost — no measured aspect
    sensitivity there, and the model would extrapolate to unprobed
    full-width strips).

    force_grid=(nr, nc) bypasses the cap search and plans exactly that
    grid: measured per-tile wall time varies ~30% with tile ASPECT at
    equal area on TPU (tools/tile_probe.py r4 capture — wide-W tiles map
    better), so callers that have probed a faster aspect can serve it.

    Unlike the reference's fixed square stride sweep (attn_video_vae.py:
    1294+), this (a) produces ONE tile shape (one XLA compilation, full mesh
    waves), (b) never computes past the edge, and (c) exploits that the
    memory constraint is the tile AREA, not its side: e.g. a 270x480 latent
    under a 136^2 cap plans 3x3 tiles of 101x171 (1.20x compute) instead of
    the sweep's 12 mixed-shape tiles (1.71x).

    Returns (ys, th, xs, tw)."""
    if force_grid is not None:
        nr = max(1, min(int(force_grid[0]), h))
        nc = max(1, min(int(force_grid[1]), w))
        th = min(h, math.ceil((h + (nr - 1) * ov_h) / nr))
        tw = min(w, math.ceil((w + (nc - 1) * ov_w) / nc))
        return _even_starts(h, th, nr), th, _even_starts(w, tw, nc), tw
    best = None
    for nr in range(1, min(h, 64) + 1):
        th = min(h, math.ceil((h + (nr - 1) * ov_h) / nr))
        if nr > 1 and th <= ov_h:
            break
        # smallest nc whose tile width fits the area cap (larger nc only
        # increases total area for this nr)
        nc_found = None
        for nc in range(1, min(w, 64) + 1):
            tw = min(w, math.ceil((w + (nc - 1) * ov_w) / nc))
            if nc > 1 and tw <= ov_w:
                break
            if th * tw <= cap_area:
                nc_found = (nc, tw)
                break
        if nc_found is None:
            continue
        nc, tw = nc_found
        # for fixed nr, the smallest fitting nc minimizes BOTH costs
        # (nc*tw and the per-tile term grow with nc), so comparing one
        # candidate per nr remains exhaustive under either model
        c = (_tile_cost_aspect(nr * nc, th, tw) if cost == "aspect"
             else float(nr * nc * th * tw))
        if best is None or c < best[0]:
            best = (c, nr, nc, th, tw)
    if best is None:  # cap smaller than any coverable tile: degenerate 1x1
        return [0], h, [0], w
    _, nr, nc, th, tw = best
    return _even_starts(h, th, nr), th, _even_starts(w, tw, nc), tw


def _encode_slices(params, cfg: VAEConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Temporally-sliced encode as a pure traceable function (the logic of
    VideoVAE._sliced_encode without the per-call jit wrappers), for
    embedding in larger programs and for compile-only memory probes
    (utils/memplan.py). Returns the latent moments (un-truncated)."""
    T = x.shape[1]
    split = cfg.slicing_sample_min_size
    if (T - 1) <= split:
        return encoder_core(params, cfg, x, None)[0]
    outs = []
    moments, state = encoder_core(params, cfg, x[:, : split + 1], None)
    outs.append(moments)
    pos = split + 1
    while pos < T:
        moments, state = encoder_core(params, cfg, x[:, pos: pos + split],
                                      state)
        outs.append(moments)
        pos += split
    return jnp.concatenate(outs, axis=1)


def _decode_slices(params, cfg: VAEConfig, z: jnp.ndarray) -> jnp.ndarray:
    """Temporally-sliced decode as a pure traceable function (the logic of
    VideoVAE._sliced_decode without the per-call jit wrappers, so it can be
    embedded inside larger jitted programs such as the tiled-decode scan)."""
    Tl = z.shape[1]
    split = cfg.slicing_latent_min_size
    if (Tl - 1) <= split:
        return decoder_core(params, cfg, z, None)[0]
    outs = []
    out, state = decoder_core(params, cfg, z[:, : split + 1], None)
    outs.append(out)
    pos = split + 1
    while pos < Tl:
        out, state = decoder_core(params, cfg, z[:, pos: pos + split], state)
        outs.append(out)
        pos += split
    return jnp.concatenate(outs, axis=1)


def _attach_int8_weights(node):
    """Attach per-channel int8 copies ("wq"/"ws") to every decoder conv the
    int8 path can serve (full (3,·,·) kernels with lane-tileable channel
    dims), so the quantization happens once at construction instead of
    inside every jitted decode call (models/vae/model.py:norm_silu_conv)."""
    from ...ops.int8_conv import quantize_conv_weight

    if isinstance(node, dict):
        out = {k: _attach_int8_weights(v) for k, v in node.items()}
        w = node.get("w")
        if (getattr(w, "ndim", 0) == 5 and w.shape[0] == 3
                and w.shape[-2] % 128 == 0 and w.shape[-1] % 128 == 0):
            wq, ws = quantize_conv_weight(w)
            out["wq"], out["ws"] = wq, ws
        return out
    return node


class VideoVAE:
    """Stateless-parameter VAE with reference-equivalent encode/decode."""

    def __init__(self, params: dict, cfg: VAEConfig = VAEConfig(),
                 dtype=jnp.bfloat16):
        if cfg.conv_quant == "int8" and "decoder" in params:
            params = dict(params,
                          decoder=_attach_int8_weights(params["decoder"]))
        self.params = params
        self.cfg = cfg
        self.dtype = dtype
        # output-space tile rectangles of the last tiled call, for the
        # --tile_debug overlay (reference: debug.encode/decode_tile_boundaries)
        self.last_encode_tiles = []
        self.last_decode_tiles = []
        # optional jax Mesh for tile-parallel tiled encode/decode: same-shape
        # tiles are stacked on the batch axis and sharded across chips (one
        # tile per chip per wave — per-chip HBM stays that of a single tile).
        # Replaces the reference's per-GPU frame fan-out for the VAE phases,
        # which dominate 4K wall time (README.md:940).
        self.mesh = None
        # Snapshot the module-level lowering switches at construction so
        # the memplan probe signature keys off the values this instance
        # was built under, not whatever the globals hold at probe time
        # (A/B tools mutate them between variants; ADVICE r4 #3).
        from . import model as _vae_model

        self._im2col_max_k = _vae_model._IM2COL_MAX_K
        self._upsample_convt = _vae_model._UPSAMPLE_CONVT
        self._head_correction = _vae_model._HEAD_CORRECTION

        cfg_ = cfg
        snapshot = (self._im2col_max_k, self._upsample_convt,
                    self._head_correction)

        def _pinned(fn):
            """jit wrapper whose TRACE runs under the construction-time
            switch snapshot, so the compiled program, the memplan
            signature, and the instance always agree even if a caller
            mutates the module globals between construction and the first
            call (the jitted python body only executes at trace time)."""

            def traced(*args):
                saved = (_vae_model._IM2COL_MAX_K,
                         _vae_model._UPSAMPLE_CONVT,
                         _vae_model._HEAD_CORRECTION)
                (_vae_model._IM2COL_MAX_K, _vae_model._UPSAMPLE_CONVT,
                 _vae_model._HEAD_CORRECTION) = snapshot
                try:
                    return fn(*args)
                finally:
                    (_vae_model._IM2COL_MAX_K, _vae_model._UPSAMPLE_CONVT,
                     _vae_model._HEAD_CORRECTION) = saved

            return jax.jit(traced)

        @_pinned
        def enc_first(p, x):
            return encoder_core(p, cfg_, x, None)

        @_pinned
        def enc_rest(p, x, s):
            return encoder_core(p, cfg_, x, s)

        @_pinned
        def dec_first(p, z):
            return decoder_core(p, cfg_, z, None)

        @_pinned
        def dec_rest(p, z, s):
            return decoder_core(p, cfg_, z, s)

        # State-free variants for slices whose carried tails have no
        # consumer (the only slice, or the last one). Dropping new_state
        # INSIDE the jit lets XLA dead-code the tail computation and its
        # HBM writes — the full state dict of a 1088 px decode tile is
        # ~9.6 GB of outputs (measured via memory_analysis), which both
        # blew the 16 GB chip on unsliced tile decodes and wasted ~10 GB
        # of write bandwidth per encode tile.
        @_pinned
        def enc_first_only(p, x):
            return encoder_core(p, cfg_, x, None)[0]

        @_pinned
        def enc_rest_only(p, x, s):
            return encoder_core(p, cfg_, x, s)[0]

        @_pinned
        def dec_first_only(p, z):
            return decoder_core(p, cfg_, z, None)[0]

        @_pinned
        def dec_rest_only(p, z, s):
            return decoder_core(p, cfg_, z, s)[0]

        self._pinned = _pinned
        self._enc_first, self._enc_rest = enc_first, enc_rest
        self._dec_first, self._dec_rest = dec_first, dec_rest
        self._enc_first_only, self._enc_rest_only = enc_first_only, enc_rest_only
        self._dec_first_only, self._dec_rest_only = dec_first_only, dec_rest_only
        self._tiled_scan_cache = {}

    # -------------------------------------------------- temporal slicing --

    def _sliced_encode(self, x: jnp.ndarray) -> jnp.ndarray:
        T = x.shape[1]
        split = self.cfg.slicing_sample_min_size
        if (T - 1) <= split:
            return self._enc_first_only(self.params, x)
        outs = []
        first = x[:, : split + 1]
        moments, state = self._enc_first(self.params, first)
        outs.append(moments)
        pos = split + 1
        while pos < T:
            chunk = x[:, pos: pos + split]
            if pos + split >= T:  # last slice: tails have no consumer
                moments = self._enc_rest_only(self.params, chunk, state)
            else:
                moments, state = self._enc_rest(self.params, chunk, state)
            outs.append(moments)
            pos += split
        return jnp.concatenate(outs, axis=1)

    def _sliced_decode(self, z: jnp.ndarray) -> jnp.ndarray:
        Tl = z.shape[1]
        split = self.cfg.slicing_latent_min_size
        if (Tl - 1) <= split:
            return self._dec_first_only(self.params, z)
        outs = []
        first = z[:, : split + 1]
        out, state = self._dec_first(self.params, first)
        outs.append(out)
        pos = split + 1
        while pos < Tl:
            chunk = z[:, pos: pos + split]
            if pos + split >= Tl:  # last slice: tails have no consumer
                out = self._dec_rest_only(self.params, chunk, state)
            else:
                out, state = self._dec_rest(self.params, chunk, state)
            outs.append(out)
            pos += split
        return jnp.concatenate(outs, axis=1)

    # --------------------------------------------------- spatial tiling --

    def _tile_map(self, run, crops):
        """Run `run` (sliced encode/decode core) over a list of same-batch
        crops. With a mesh attached, same-shape crops are stacked on the
        batch axis and sharded over ALL mesh axes combined (dp x tp — the
        VAE has no tensor parallelism, so tp chips take tiles too) in
        waves of n_devices (tiles are embarrassingly parallel; XLA shards
        every batch-elementwise op, so per-chip memory = one tile).
        Returns f32 results in input order."""
        if self.mesh is None or len(crops) == 1:
            return [run(c).astype(jnp.float32) for c in crops]

        from jax.sharding import NamedSharding, PartitionSpec

        axes = tuple(self.mesh.axis_names)
        nd = int(np.prod([self.mesh.shape[a] for a in axes]))
        sharding = NamedSharding(self.mesh, PartitionSpec(axes))
        b = crops[0].shape[0]

        by_shape = {}
        for i, c in enumerate(crops):
            by_shape.setdefault(c.shape, []).append(i)
        out = [None] * len(crops)
        from ...utils.partition import partition_by_size

        for idxs in by_shape.values():
            for wave in partition_by_size(idxs, nd):
                pad = nd - len(wave)
                stack = [crops[i] for i in wave] + [crops[wave[0]]] * pad
                batch = jax.device_put(
                    jnp.concatenate(stack, axis=0), sharding)
                res = run(batch).astype(jnp.float32)
                for j, i in enumerate(wave):
                    out[i] = res[j * b: (j + 1) * b]
        return out

    def encode(self, x: jnp.ndarray, tiled: bool = False,
               tile_size: Tuple[int, int] = (512, 512),
               tile_overlap: Tuple[int, int] = (64, 64),
               tile_mode: str = "ref",
               tile_grid: Tuple[int, int] = None) -> jnp.ndarray:
        """x: (B, T, H, W, 3) in [-1, 1], T % 4 == 1 -> latent mode
        (B, (T-1)/4+1, H/8, W/8, latent_channels).

        tile_mode: "ref" reproduces the reference's stride-sweep tile layout
        (attn_video_vae.py:1294+, incl. sliver edge tiles); "uniform" uses
        the even same-shape grid (_plan_axis) — one compile shape, no
        overflow compute, full mesh waves."""
        x = x.astype(self.dtype)
        B, T, H, W, _ = x.shape
        lat = self.cfg.latent_channels
        if not tiled or (H <= tile_size[0] and W <= tile_size[1]):
            return self._sliced_encode(x)[..., :lat]

        sf = self.cfg.spatial_downsample_factor
        lt_h = max(1, tile_size[0] // sf)
        lt_w = max(1, tile_size[1] // sf)
        lo_h = max(0, min(tile_overlap[0] // sf, lt_h - 1))
        lo_w = max(0, min(tile_overlap[1] // sf, lt_w - 1))
        H_lat = (H + sf - 1) // sf
        W_lat = (W + sf - 1) // sf
        Tl = (T - 1) // self.cfg.temporal_downsample_factor + 1

        result = jnp.zeros((B, Tl, H_lat, W_lat, lat), dtype=jnp.float32)
        count = jnp.zeros((1, 1, H_lat, W_lat, 1), dtype=jnp.float32)
        self.last_encode_tiles = []

        rects = []
        fade_h, fade_w = lo_h, lo_w
        if tile_mode == "uniform":
            ys, th, xs, tw = _plan_grid(H_lat, W_lat, lt_h * lt_w, lo_h, lo_w,
                                        force_grid=tile_grid)
            fade_h = min(lo_h, _min_overlap(ys, th)) or lo_h
            fade_w = min(lo_w, _min_overlap(xs, tw)) or lo_w
            rects = [(y, y + th, xx, xx + tw) for y in ys for xx in xs]
        else:
            stride_h = max(1, lt_h - lo_h)
            stride_w = max(1, lt_w - lo_w)
            for y in range(0, H_lat, stride_h):
                y_end = min(y + lt_h, H_lat)
                if y > 0 and (y_end - y) <= lo_h:
                    continue
                for xx in range(0, W_lat, stride_w):
                    x_end = min(xx + lt_w, W_lat)
                    if xx > 0 and (x_end - xx) <= lo_w:
                        continue
                    rects.append((y, y_end, xx, x_end))
        self.last_encode_tiles = [
            (y * sf, xx * sf, (y_end - y) * sf, (x_end - xx) * sf)
            for (y, y_end, xx, x_end) in rects]

        crops = [x[:, :, y * sf: min(y_end * sf, H),
                   xx * sf: min(x_end * sf, W)]
                 for (y, y_end, xx, x_end) in rects]
        tiles = self._tile_map(
            lambda c: self._sliced_encode(c)[..., :lat], crops)

        for (y, y_end, xx, x_end), tile in zip(rects, tiles):
            eh = min(y_end - y, tile.shape[2], H_lat - y)
            ew = min(x_end - xx, tile.shape[3], W_lat - xx)
            tile = tile[:, :Tl, :eh, :ew]
            wh = _fade_weights(eh, fade_h, y > 0, y_end < H_lat)
            ww = _fade_weights(ew, fade_w, xx > 0, x_end < W_lat)
            mask = jnp.asarray(np.outer(wh, ww))[None, None, :, :, None]
            result = result.at[:, :, y: y + eh, xx: xx + ew].add(tile * mask)
            count = count.at[:, :, y: y + eh, xx: xx + ew].add(mask)
        result = result / jnp.clip(count, 1e-6)
        return result.astype(self.dtype)

    def _decode_tiled_scan(self, z, rects, th, tw, fade_h, fade_w):
        """Single-jit tiled decode for the uniform grid: lax.scan over the
        same-shape tiles keeps peak HBM = one tile's workspace + the output
        accumulator, with no eager per-tile dispatch (which strands dead
        buffers on backends with deferred reclamation) and one compiled
        program for the whole 4K decode."""
        B, Tl, h, w, _ = z.shape
        sf = self.cfg.spatial_downsample_factor
        T = (Tl - 1) * self.cfg.temporal_downsample_factor + 1
        H, W = h * sf, w * sf
        n = len(rects)
        masks = np.empty((n, th * sf, tw * sf), np.float32)
        count = np.zeros((H, W), np.float32)
        pos = np.empty((n, 2), np.int32)
        for t_i, (y, y_end, xx, x_end) in enumerate(rects):
            wh = _fade_weights((y_end - y) * sf, fade_h, y > 0, y_end < h)
            ww = _fade_weights((x_end - xx) * sf, fade_w, xx > 0, x_end < w)
            m = np.outer(wh, ww).astype(np.float32)
            masks[t_i] = m
            count[y * sf: y_end * sf, xx * sf: x_end * sf] += m
            pos[t_i] = (y * sf, xx * sf)
        inv_count = (1.0 / np.clip(count, 1e-6, None))[None, None, :, :, None]

        key = (z.shape, tuple(rects), fade_h, fade_w)
        if key not in self._tiled_scan_cache:
            cfg = self.cfg
            rects_c = tuple(rects)
            masks_c = jnp.asarray(masks)
            pos_c = jnp.asarray(pos)
            inv_c = jnp.asarray(inv_count)
            out_tile = (B, T, th * sf, tw * sf, 3)

            @self._pinned
            def run(params, z):
                crops = jnp.stack([z[:, :, y:y_end, xx:x_end]
                                   for (y, y_end, xx, x_end) in rects_c])

                def body(result, inp):
                    crop, mask, p = inp
                    tile = _decode_slices(params, cfg, crop).astype(
                        jnp.float32)
                    tile = tile * mask[None, None, :, :, None]
                    start = (0, 0, p[0], p[1], 0)
                    cur = jax.lax.dynamic_slice(result, start, out_tile)
                    return jax.lax.dynamic_update_slice(
                        result, cur + tile, start), None

                init = jnp.zeros((B, T, H, W, 3), jnp.float32)
                result, _ = jax.lax.scan(body, init,
                                         (crops, masks_c, pos_c))
                return (result * inv_c).astype(z.dtype)

            self._tiled_scan_cache[key] = run
        return self._tiled_scan_cache[key](self.params, z)

    def decode(self, z: jnp.ndarray, tiled: bool = False,
               tile_size: Tuple[int, int] = (512, 512),
               tile_overlap: Tuple[int, int] = (64, 64),
               tile_mode: str = "ref",
               tile_grid: Tuple[int, int] = None) -> jnp.ndarray:
        """z: (B, Tl, h, w, latent) -> (B, (Tl-1)*4+1, 8h, 8w, 3).

        tile_mode as in encode(): "ref" = reference stride-sweep layout,
        "uniform" = even same-shape grid. tile_grid=(nr, nc) forces that
        uniform grid regardless of the area cap (tile aspect is a measured
        ~30% per-tile wall-time lever — see _plan_grid)."""
        z = z.astype(self.dtype)
        B, Tl, h, w, _ = z.shape
        sf = self.cfg.spatial_downsample_factor
        lt_h = max(1, tile_size[0] // sf)
        lt_w = max(1, tile_size[1] // sf)
        if not tiled or (h <= lt_h and w <= lt_w):
            return self._sliced_decode(z)

        lo_h = max(0, min(tile_overlap[0] // sf, lt_h - 1))
        lo_w = max(0, min(tile_overlap[1] // sf, lt_w - 1))
        T = (Tl - 1) * self.cfg.temporal_downsample_factor + 1
        H, W = h * sf, w * sf

        result = jnp.zeros((B, T, H, W, 3), dtype=jnp.float32)
        count = jnp.zeros((1, 1, H, W, 1), dtype=jnp.float32)

        rects = []
        fade_h, fade_w = tile_overlap[0], tile_overlap[1]
        if tile_mode == "uniform":
            ys, th, xs, tw = _plan_grid(h, w, lt_h * lt_w, lo_h, lo_w,
                                        force_grid=tile_grid, cost="aspect")
            fade_h = min(tile_overlap[0], _min_overlap(ys, th) * sf) \
                or tile_overlap[0]
            fade_w = min(tile_overlap[1], _min_overlap(xs, tw) * sf) \
                or tile_overlap[1]
            rects = [(y, y + th, xx, xx + tw) for y in ys for xx in xs]
            self.last_decode_tiles = [
                (y * sf, xx * sf, (y_end - y) * sf, (x_end - xx) * sf)
                for (y, y_end, xx, x_end) in rects]
            if self.mesh is None:
                return self._decode_tiled_scan(z, rects, th, tw,
                                               fade_h, fade_w)
        else:
            stride_h = max(1, lt_h - lo_h)
            stride_w = max(1, lt_w - lo_w)
            for y in range(0, h, stride_h):
                y_end = min(y + lt_h, h)
                if y > 0 and (y_end - y) <= lo_h:
                    continue
                for xx in range(0, w, stride_w):
                    x_end = min(xx + lt_w, w)
                    if xx > 0 and (x_end - xx) <= lo_w:
                        continue
                    rects.append((y, y_end, xx, x_end))
        self.last_decode_tiles = [
            (y * sf, xx * sf, (y_end - y) * sf, (x_end - xx) * sf)
            for (y, y_end, xx, x_end) in rects]

        crops = [z[:, :, y:y_end, xx:x_end] for (y, y_end, xx, x_end) in rects]
        tiles = self._tile_map(self._sliced_decode, crops)

        for (y, y_end, xx, x_end), tile in zip(rects, tiles):
            yo, yo_end = y * sf, y_end * sf
            xo, xo_end = xx * sf, x_end * sf
            # decode fades are computed in output space with the *pixel*
            # overlap (attn_video_vae.py:1508-1515)
            wh = _fade_weights(yo_end - yo, fade_h, y > 0, y_end < h)
            ww = _fade_weights(xo_end - xo, fade_w, xx > 0, x_end < w)
            mask = jnp.asarray(np.outer(wh, ww))[None, None, :, :, None]
            result = result.at[:, :tile.shape[1], yo:yo_end, xo:xo_end].add(
                tile * mask)
            count = count.at[:, :, yo:yo_end, xo:xo_end].add(mask)
        result = result / jnp.clip(count, 1e-6)
        return result.astype(self.dtype)


# --------------------------------------------------------------------------
# Random init (tests / benchmarks without checkpoints)
# --------------------------------------------------------------------------


def init_vae_params(key, cfg: VAEConfig = VAEConfig(),
                    dtype=jnp.bfloat16) -> dict:
    """Random parameter tree with checkpoint-identical structure."""
    counter = [0]
    base_key = key

    def nk():
        counter[0] += 1
        return jax.random.fold_in(base_key, counter[0])

    def conv(ci, co, k=(3, 3, 3)):
        fan_in = ci * k[0] * k[1] * k[2]
        bound = 1.0 / math.sqrt(fan_in)
        return {
            "w": jax.random.uniform(nk(), (*k, ci, co), jnp.float32,
                                    -bound, bound).astype(dtype),
            "b": jax.random.uniform(nk(), (co,), jnp.float32,
                                    -bound, bound).astype(dtype),
        }

    def lin(ci, co):
        bound = 1.0 / math.sqrt(ci)
        return {
            "w": jax.random.uniform(nk(), (ci, co), jnp.float32,
                                    -bound, bound).astype(dtype),
            "b": jax.random.uniform(nk(), (co,), jnp.float32,
                                    -bound, bound).astype(dtype),
        }

    def norm(c):
        return {"weight": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)}

    # legacy "half" receptive field stores conv2 as a depth-1 kernel
    # (video_vae.py:273-280); the forward derives its pad from the shape
    k2 = (3, 3, 3) if cfg.time_receptive_field != "half" else (1, 3, 3)

    def resnet(ci, co):
        p = {"norm1": norm(ci), "conv1": conv(ci, co),
             "norm2": norm(co), "conv2": conv(co, co, k2)}
        if ci != co:
            p["conv_shortcut"] = conv(ci, co, (1, 1, 1))
        return p

    def attn(c):
        return {"group_norm": norm(c), "to_q": lin(c, c), "to_k": lin(c, c),
                "to_v": lin(c, c), "to_out": {"0": lin(c, c)}}

    chans = cfg.block_out_channels
    n = len(chans)
    enc = {"conv_in": conv(cfg.in_channels, chans[0])}
    in_ch = chans[0]
    for i in range(n):
        out_ch = chans[i]
        blk = {"resnets": {}}
        for j in range(cfg.layers_per_block):
            blk["resnets"][str(j)] = resnet(in_ch if j == 0 else out_ch, out_ch)
        in_ch = out_ch
        if i < n - 1:
            td = i >= n - cfg.temporal_scale_num - 1
            kt = 3 if td else 1
            blk["downsamplers"] = {"0": {"conv": conv(out_ch, out_ch, (kt, 3, 3))}}
        enc[f"down_blocks.{i}"] = blk
    enc["mid_block"] = {
        "resnets": {"0": resnet(chans[-1], chans[-1]),
                    "1": resnet(chans[-1], chans[-1])},
    }
    if cfg.mid_attention:
        enc["mid_block"]["attentions"] = {"0": attn(chans[-1])}
    enc["conv_norm_out"] = norm(chans[-1])
    enc["conv_out"] = conv(chans[-1], 2 * cfg.latent_channels)

    rev = list(reversed(chans))
    dec = {"conv_in": conv(cfg.latent_channels, rev[0])}
    dec["mid_block"] = {
        "resnets": {"0": resnet(rev[0], rev[0]), "1": resnet(rev[0], rev[0])},
    }
    if cfg.mid_attention:
        dec["mid_block"]["attentions"] = {"0": attn(rev[0])}
    in_ch = rev[0]
    for i in range(n):
        out_ch = rev[i]
        blk = {"resnets": {}}
        for j in range(cfg.layers_per_block + 1):
            blk["resnets"][str(j)] = resnet(in_ch if j == 0 else out_ch, out_ch)
        in_ch = out_ch
        if i < n - 1:
            tu = i < cfg.temporal_scale_num
            ratio = 4 * (2 if tu else 1)
            blk["upsamplers"] = {"0": {
                "upscale_conv": conv(out_ch, out_ch * ratio, (1, 1, 1)),
                "conv": conv(out_ch, out_ch),
            }}
        dec[f"up_blocks.{i}"] = blk
    dec["conv_norm_out"] = norm(chans[0])
    dec["conv_out"] = conv(chans[0], cfg.out_channels)

    def nest(flat):
        out = {}
        for k, v in flat.items():
            parts = k.split(".")
            node = out
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = v
        return out

    tree = {"encoder": nest(enc), "decoder": nest(dec)}
    if cfg.use_quant_conv:
        tree["quant_conv"] = conv(
            2 * cfg.latent_channels, 2 * cfg.latent_channels, (1, 1, 1))
    if cfg.use_post_quant_conv:
        tree["post_quant_conv"] = conv(
            cfg.latent_channels, cfg.latent_channels, (1, 1, 1))
    return tree
