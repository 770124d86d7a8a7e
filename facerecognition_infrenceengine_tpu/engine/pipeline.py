"""The fused TPU recognition pipeline.

The reference's per-frame path is: ONNX detector (host loop over scales +
CPU NMS) → per-face cv2 warp → ONNX embedder → python cosine loop
(reference infrenceServer.py:515-563).  Here the whole thing is two jitted
XLA programs with static shapes:

1. ``detect``: [B, H, W, 3] uint8 canvas → SCRFD forward → sigmoid → decode
   (ops.boxes) → masked top-k → greedy NMS (ops.nms) → fixed ``max_faces``
   slots per frame.  No host round-trip inside.
2. ``embed``: native frames + landmark sets → batched Umeyama + bilinear
   warp (ops.align) → IResNet-50 → L2-normalized [M, 512].

Between the two, the host compacts the variable number of detected faces
into bucketed batch sizes (powers of two), so XLA compiles a handful of
shapes once and the MXU always sees dense batches.  ``detect_align_embed``
additionally offers the fully-fused single-program variant used by the
benchmark and the compile-check entry point.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import EngineConfig, get_config
from ..models import arcface, scrfd
from ..models.weights import load_or_init
from ..ops.align import ARCFACE_DST
from ..ops.warp2pass import warp_faces_two_pass
from ..ops.anchors import all_anchor_centers
from ..ops.boxes import distance2bbox, distance2kps
from ..ops.matching import l2_normalize
from ..ops.nms import nms_padded


def _stride_rows(height: int, width: int) -> np.ndarray:
    """Per-anchor-row stride multiplier, matching all_anchor_centers order."""
    parts = []
    for s in scrfd.STRIDES:
        n = (height // s) * (width // s) * scrfd.NUM_ANCHORS
        parts.append(np.full(n, float(s), np.float32))
    return np.concatenate(parts)


def bucket(n: int, buckets=(1, 2, 4, 8, 16, 32, 64, 128, 256)) -> int:
    """Round up to the nearest compiled batch shape."""
    for b in buckets:
        if n <= b:
            return b
    return ((n + buckets[-1] - 1) // buckets[-1]) * buckets[-1]


def _calibration_crops(n: int, size: int, seed: int = 1234) -> np.ndarray:
    """Deterministic structured calibration images for PTQ.

    Aligned face crops are dominated by smooth shading (skin), a bright
    oval on a darker background, localized dark features (eyes/brows/
    mouth) and mild texture.  These synthetic crops span that structure —
    per-image varying illumination gradients, an elliptical bright
    region, feature blobs, and low-amplitude noise — so abs-max
    activation scales land far closer to real-face ranges than uniform
    noise (whose full-range high-frequency energy mis-sizes early-layer
    ranges).  Still synthetic: with real converted weights, calibrate
    from real aligned crops via FaceEngine.recalibrate_int8.
    """
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / (size - 1)
    crops = np.empty((n, size, size, 3), np.uint8)
    for i in range(n):
        gx, gy = rng.uniform(-60, 60, 2)
        base = rng.uniform(70, 170)
        img = base + gx * (xx - 0.5) + gy * (yy - 0.5)
        # face oval (center-bright ellipse)
        cx, cy = rng.uniform(0.4, 0.6, 2)
        d = ((xx - cx) / 0.32) ** 2 + ((yy - cy) / 0.45) ** 2
        img = img + rng.uniform(20, 70) * np.exp(-d)
        img = np.repeat(img[:, :, None], 3, axis=2)
        img *= np.array([1.0, rng.uniform(0.75, 0.95),
                         rng.uniform(0.6, 0.9)], np.float32)  # skin-ish tint
        # dark feature blobs (eyes, brows, mouth analogues)
        for _ in range(rng.integers(3, 6)):
            bx, by = rng.uniform(0.2, 0.8, 2)
            bw = rng.uniform(0.04, 0.12)
            blob = np.exp(-(((xx - bx) / bw) ** 2 + ((yy - by) / (bw * 0.6)) ** 2))
            img -= rng.uniform(30, 90) * blob[:, :, None]
        img += rng.normal(0, 6, img.shape)  # sensor-noise texture
        crops[i] = np.clip(img, 0, 255).astype(np.uint8)
    return crops


@dataclass
class DetectionBatch:
    """Host-side view of the detect program's fixed-shape outputs."""

    boxes: np.ndarray  # [B, F, 4] canvas coords, xyxy
    scores: np.ndarray  # [B, F]
    kps: np.ndarray  # [B, F, 5, 2] canvas coords
    valid: np.ndarray  # [B, F] bool


class FaceEngine:
    """Owns model variables and the jitted programs."""

    def __init__(self, cfg: EngineConfig | None = None, det_variables=None,
                 rec_variables=None, det_arch: str = "det_10g",
                 rec_arch: str = "r50", seed: int = 0):
        self.cfg = cfg or get_config().engine
        dtype = jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32
        self.detector = scrfd.SCRFD(scrfd.CONFIGS[det_arch], dtype=dtype)
        if rec_arch == "mobilefacenet":
            from ..models import mobilefacenet

            self.embedder = mobilefacenet.mobilefacenet(dtype=dtype)
        else:
            self.embedder = (arcface.iresnet50 if rec_arch == "r50"
                             else arcface.iresnet18)(dtype=dtype)
        self.rec_arch = rec_arch
        h, w = self.cfg.det_size
        if det_variables is None:
            det_variables = load_or_init(
                f"scrfd_{det_arch}", self.detector, jnp.zeros((1, h, w, 3), jnp.float32), seed
            )
        if rec_variables is None:
            rec_variables = load_or_init(
                f"arcface_{rec_arch}", self.embedder,
                jnp.zeros((1, self.cfg.embed_size, self.cfg.embed_size, 3), jnp.float32), seed + 1
            )
        if (self.cfg.packed_stem and "packed_stem" not in det_variables
                and "batch_stats" in det_variables):
            # Opt-in (EngineConfig.packed_stem — measured slower in situ,
            # see core/config.py): space-to-depth stem kernels with BN
            # folded in (models/packed_stem.py), precomputed once and
            # carried as an extra collection so every jitted program sees
            # them as ordinary inputs.
            from ..models import packed_stem

            det_variables = dict(det_variables)
            det_variables["packed_stem"] = packed_stem.precompute_packed_stem(
                det_variables, self.detector.dtype)
        # Raw-frame path: the fused Pallas stem is opt-in (measured ~1.1 ms
        # slower in situ when the program must first space-to-depth raw
        # frames on device).  The PACKED-input path (detect_align_embed_
        # packed) uses it only when packed_stem_impl="pallas"; both stem
        # weight sets are precomputed whenever possible and carried as
        # extra collections (ordinary jit inputs).
        self._stem_kernel_raw = (self.cfg.stem_kernel == "on"
                                 or (self.cfg.stem_kernel == "auto"
                                     and jax.default_backend() == "tpu"))
        if ("stem_pallas" not in det_variables
                and "batch_stats" in det_variables):
            from ..ops import stem_pallas

            det_variables = dict(det_variables)
            det_variables["stem_pallas"] = stem_pallas.precompute_fused_stem(
                det_variables, self.detector.dtype)
        if (self.cfg.packed_stem_impl == "xla"
                and "packed_stem_s2d4" not in det_variables
                and "batch_stats" in det_variables):
            # Packed-input stem as plain XLA convs (opt-in
            # packed_stem_impl="xla"; ~0.3 MB of BN-folded kernels) — see
            # models/packed_stem.packed_stem_forward_s2d4.  Only built
            # when selected: an extra collection changes det_variables'
            # pytree structure and with it every program's compile-cache
            # key.
            from ..models import packed_stem

            det_variables = dict(det_variables)
            det_variables["packed_stem_s2d4"] = (
                packed_stem.precompute_packed_stem_s2d4(
                    det_variables, self.detector.dtype))
        self.det_variables = det_variables
        self.rec_variables = rec_variables
        self._embed_scales = None
        self._int8_calibration = None
        if self.cfg.embed_int8 and rec_arch in ("r50", "r18"):
            # int8 PTQ embedder (models/quant.py): per-channel int8 conv
            # weights + per-layer activation scales.  The default
            # calibration set is deterministic *structured* crops
            # (face-oval shading + feature blobs + texture — see
            # _calibration_crops), not uniform noise: noise-driven abs-max
            # scales can silently clip or waste range on real-face
            # activation distributions.  Production deployments with real
            # weights should call recalibrate_int8(real_aligned_crops).
            from ..models import quant

            self._quant_depths = (3, 4, 14, 3) if rec_arch == "r50" else (2, 2, 2, 2)
            qw = quant.quantize_weights(rec_variables,
                                        depths=self._quant_depths)
            # Carried as an extra collection so the jitted programs take
            # the int8 weights as inputs rather than baking ~25 MB of
            # constants into every executable (and cache entry).
            rec_variables = dict(rec_variables)
            rec_variables["int8"] = qw
            self.rec_variables = rec_variables
            self.recalibrate_int8()
        self._det_q = None
        self._det_scales = None
        if self.cfg.det_int8 and "batch_stats" in det_variables:
            # int8 PTQ detector backbone (models/quant.py) — same
            # calibrate-at-build scheme as the embedder.
            from ..models import quant

            calib_frames = jnp.asarray(_calibration_crops(4, max(h, w),
                                                          seed=4321)[:, :h, :w])
            calib_x = scrfd.preprocess(calib_frames)
            dscales = quant.calibrate_scrfd(det_variables, calib_x,
                                            self.detector.cfg, dtype=dtype)
            dqw = quant.quantize_scrfd_weights(det_variables,
                                               self.detector.cfg)
            det_variables = dict(det_variables)
            det_variables["int8"] = dqw
            self.det_variables = det_variables
            self._det_scales = dscales
            self._det_q = True
        self._centers = all_anchor_centers(h, w)
        self._strides = jnp.asarray(_stride_rows(h, w))
        self._dst = jnp.asarray(ARCFACE_DST) * (self.cfg.embed_size / 112.0)

        self._detect_jit = jax.jit(self._detect_impl)
        self._embed_jit = jax.jit(self._embed_impl)
        self._embed_crops_jit = jax.jit(self._embed_crops_impl)
        self._fused_jit = jax.jit(self._fused_impl)
        self._fused_packed_jit = jax.jit(self._fused_packed_impl)
        self._fused_yuv_jit = jax.jit(self._fused_yuv_impl)
        self._fused_flat_jit = jax.jit(self._fused_flat_impl)
        self._fused_yuv_flat_jit = jax.jit(self._fused_yuv_flat_impl)
        self._attr_jit = jax.jit(self._attributes_impl)
        self._attr_variables = None  # (genderage, landmark106), lazy
        self._attr_runners = None    # exact-graph OnnxRunners when converted
        self._attr_sizes = None

    # -------------------------------------------------------------- programs
    def _detect_impl(self, det_variables, frames_u8, det_threshold):
        cfg = self.cfg
        x = scrfd.preprocess(frames_u8)
        stem_out = None
        h, w = int(frames_u8.shape[1]), int(frames_u8.shape[2])
        if (self._stem_kernel_raw and "stem_pallas" in det_variables
                and h % 4 == 0 and w % 4 == 0
                and ((h // 4) % 16 == 0 or h // 4 <= 64)):
            # Fused Pallas stem kernel (ops/stem_pallas.py).  NB: wins
            # isolated but measured ~1.1 ms slower in situ from raw
            # frames (see the module docstring) — off by default, kept
            # for packed-input deployments and re-measurement.
            from ..ops import stem_pallas

            x4 = stem_pallas.prepare_input(frames_u8, dtype=jnp.uint8)
            stem_out = stem_pallas.fused_stem(
                x4, det_variables["stem_pallas"], w // 4,
                self.detector.cfg.stem_width)
        elif h % 4 == 0 and w % 4 == 0 and "packed_stem" in det_variables:
            # Evaluate the backbone stem in space-to-depth layout — same
            # weights, ~2x faster on TPU (models/packed_stem.py).  The
            # packed BN-folded kernels were derived once from the loaded
            # weights in __init__ and ride along in det_variables.
            from ..models import packed_stem

            stem_out = packed_stem.packed_stem_forward(
                x, det_variables["packed_stem"],
                self.detector.cfg.stem_width, self.detector.dtype)
        feats_in = None
        if "int8" in det_variables:
            from ..models import quant

            feats_in = quant.scrfd_backbone_forward(
                det_variables, x, self.detector.cfg,
                qw=det_variables["int8"], act_scales=self._det_scales,
                dtype=self.detector.dtype)
        logits, bbox, kps = self.detector.apply(det_variables, x,
                                                stem_out=stem_out,
                                                feats_in=feats_in)
        return self._decode_nms(logits, bbox, kps, det_threshold)

    def _decode_nms(self, logits, bbox, kps, det_threshold):
        """Shared tail of every detect program: sigmoid -> decode -> masked
        top-k -> greedy NMS at fixed [B, max_faces] capacity."""
        cfg = self.cfg
        scores = jax.nn.sigmoid(logits[..., 0])  # [B, A]
        bbox = bbox * self._strides[None, :, None]
        kps = kps * self._strides[None, :, None]
        boxes = distance2bbox(self._centers[None], bbox)  # [B, A, 4]
        points = distance2kps(self._centers[None], kps)  # [B, A, 5, 2]

        def per_image(s, b, p):
            s = jnp.where(s >= det_threshold, s, -jnp.inf)
            top_s, top_i = jax.lax.top_k(s, cfg.pre_nms_topk)
            ob, osc, oidx, valid = nms_padded(
                b[top_i], top_s, max_out=cfg.max_faces, iou_thresh=cfg.nms_iou
            )
            okps = p[top_i][oidx]
            okps = jnp.where(valid[:, None, None], okps, 0.0)
            return ob, osc, okps, valid

        return jax.vmap(per_image)(scores, boxes, points)

    def _detect_packed_impl(self, det_variables, frames_p4, det_threshold):
        """Detect from s2d4-packed u8 frames [B, H/4, W/4, 48] — the
        production input contract when the native letterbox
        (native/imagecodec.letterbox_s2d4) packs at pixel-writing time.
        Three implementations (EngineConfig.packed_stem_impl, measured at
        B=96 640x640 v5e — benchmarks/packed_insitu.py):

        - "unpack" (default, 41.9 ms): undo the s2d4 permutation on device
          and run the raw detect program — XLA fuses the u8 depth-to-space
          into the stem's input preprocessing, so it costs ~2 ms over raw
          frames (39.7 ms).
        - "xla" (67.5 ms): evaluate the stem packed as plain XLA convs
          (models/packed_stem.packed_stem_forward_s2d4); packed conv2/3
          genuinely pay 4x MACs.
        - "pallas" (92.1 ms): the VMEM-resident kernel
          (ops/stem_pallas.fused_stem) — wins isolated (21.8 ms vs 25.6 ms
          backbone) but the custom call is an optimization barrier that
          costs the downstream backbone +41 ms.
        """
        b, h4, w4, _ = frames_p4.shape
        if self.cfg.packed_stem_impl == "unpack":
            from ..ops.stem_pallas import depth_to_space4

            return self._detect_impl(det_variables,
                                     depth_to_space4(frames_p4),
                                     det_threshold)
        if (self.cfg.packed_stem_impl == "xla"
                and "packed_stem_s2d4" in det_variables):
            from ..models import packed_stem

            stem_out = packed_stem.packed_stem_forward_s2d4(
                frames_p4, det_variables["packed_stem_s2d4"],
                self.detector.cfg.stem_width, self.detector.dtype)
        else:
            from ..ops import stem_pallas

            x4 = stem_pallas.pad_packed_u8(frames_p4)
            stem_out = stem_pallas.fused_stem(
                x4, det_variables["stem_pallas"], w4,
                self.detector.cfg.stem_width,
                interpret=jax.default_backend() != "tpu")
        # Backbone runs from stem_out; x is never read on that path.
        dummy = jnp.zeros((b, 1, 1, 3), jnp.float32)
        logits, bbox, kps = self.detector.apply(det_variables, dummy,
                                                stem_out=stem_out)
        return self._decode_nms(logits, bbox, kps, det_threshold)

    def _fused_packed_impl(self, det_variables, rec_variables, frames_p4,
                           det_threshold):
        """One program: packed detect -> align -> embed.

        With packed_stem_impl="unpack" (default) the whole program IS the
        raw fused program fed through the near-free on-device unpermute
        (see _detect_packed_impl) — bit-identical outputs to
        detect_align_embed on the same pixels, with the wire carrying
        s2d4/yuv420 bytes.  The packed-atlas variant below keeps every
        stage in packed layout; it wins isolated stages but loses
        end-to-end at B>=24 (BASELINE.md round-4 packed-path paragraph).
        """
        if self.cfg.packed_stem_impl == "unpack":
            from ..ops.stem_pallas import depth_to_space4

            return self._fused_impl(det_variables, rec_variables,
                                    depth_to_space4(frames_p4),
                                    det_threshold)
        from ..ops.warp2pass import warp_faces_two_pass_packed

        boxes, scores, kps, valid = self._detect_packed_impl(
            det_variables, frames_p4, det_threshold)
        b = frames_p4.shape[0]
        f = self.cfg.max_faces
        frame_idx = jnp.repeat(jnp.arange(b), f)
        crops = warp_faces_two_pass_packed(
            frames_p4, frame_idx, kps.reshape(b * f, 5, 2),
            self.cfg.embed_size, dst=self._dst)
        emb = self._apply_embedder(rec_variables, arcface.preprocess(crops))
        emb = l2_normalize(emb)
        return boxes, scores, kps, valid, emb.reshape(b, f, -1)

    def _fused_yuv_impl(self, det_variables, rec_variables, frames_y24,
                        det_threshold):
        """Packed-YUV420 transport variant of the fused program: one
        constant 24->48 matmul (ops/yuv.py) turns the half-size wire format
        into the packed-RGB layout, then the packed program runs unchanged.
        Streaming hosts send 1.5 B/px instead of 3 (VERDICT r2 #5).

        Hosts ship only the letterbox CONTENT rows (for a 640x480 camera
        that is another 25% off the wire); the canvas is re-padded here
        with YUV black (Y=0, U=V=128 — zero chroma would decode green)."""
        from ..ops import yuv

        dh = self.cfg.det_size[0] // 4
        rows = frames_y24.shape[1]
        if rows < dh:
            b, _, w4, _ = frames_y24.shape
            pad = jnp.tile(
                jnp.asarray([0] * 16 + [128] * 8, jnp.uint8),
                (b, dh - rows, w4, 1))
            frames_y24 = jnp.concatenate([frames_y24, pad], axis=1)
        frames_p4 = yuv.yuv420p4_to_rgbp4(frames_y24)
        return self._fused_packed_impl(det_variables, rec_variables,
                                       frames_p4, det_threshold)

    def _embed_impl(self, rec_variables, frames_u8, frame_idx, kps):
        size = self.cfg.embed_size
        # Two-pass matmul warp: ~300x faster than the gather formulation on
        # TPU (see ops/warp2pass.py docstring).
        crops = warp_faces_two_pass(frames_u8, frame_idx, kps, size, dst=self._dst)
        emb = self._apply_embedder(rec_variables, arcface.preprocess(crops))
        return l2_normalize(emb)

    def _apply_embedder(self, rec_variables, x):
        if "int8" in rec_variables:
            from ..models import quant

            return quant.apply_int8(rec_variables, rec_variables["int8"],
                                    self._embed_scales, x,
                                    depths=self._quant_depths,
                                    dtype=self.embedder.dtype)
        return self.embedder.apply(rec_variables, x)

    def recalibrate_int8(self, crops_u8=None):
        """(Re)calibrate the int8 embedder's activation scales.

        crops_u8: [N, embed_size, embed_size, 3] uint8 *aligned face
        crops* — with real converted weights, pass real production crops
        (e.g. a handful of enrollment crops); None uses the deterministic
        structured default (_calibration_crops).  Scales are baked into
        the compiled executables as trace-time constants, so the jitted
        programs are rebuilt.  models/quant.clip_fractions measures scale
        drift on live data against the chosen scales.
        """
        if "int8" not in self.rec_variables:
            raise ValueError("engine was not built with embed_int8")
        from ..models import quant

        if crops_u8 is None:
            crops_u8 = _calibration_crops(8, self.cfg.embed_size)
            self._int8_calibration = "synthetic-structured"
        else:
            self._int8_calibration = f"user({len(crops_u8)} crops)"
        calib = arcface.preprocess(jnp.asarray(np.asarray(crops_u8, np.uint8)))
        self._embed_scales = quant.calibrate(
            self.rec_variables, calib, depths=self._quant_depths,
            dtype=self.embedder.dtype)
        # The scales were captured at trace time; invalidate EVERY compiled
        # program that embeds (_apply_embedder bakes self._embed_scales),
        # including the packed/yuv wire-format variants — leaving those out
        # would silently serve stale calibration on exactly the production
        # transport paths recalibration targets.
        self._embed_jit = jax.jit(self._embed_impl)
        self._embed_crops_jit = jax.jit(self._embed_crops_impl)
        self._fused_jit = jax.jit(self._fused_impl)
        self._fused_packed_jit = jax.jit(self._fused_packed_impl)
        self._fused_yuv_jit = jax.jit(self._fused_yuv_impl)
        self._fused_flat_jit = jax.jit(self._fused_flat_impl)
        self._fused_yuv_flat_jit = jax.jit(self._fused_yuv_flat_impl)

    def embed_crops(self, crops_u8) -> np.ndarray:
        """Embed pre-aligned 112x112 crops (host-warped path); [M,112,112,3]."""
        m = len(crops_u8)
        if m == 0:
            return np.zeros((0, self.cfg.embed_dim), np.float32)
        mb = bucket(m)
        pad = np.zeros((mb,) + tuple(crops_u8.shape[1:]), crops_u8.dtype)
        pad[:m] = crops_u8
        emb = self._embed_crops_jit(self.rec_variables, jnp.asarray(pad))
        return np.asarray(emb)[:m]

    def _embed_crops_impl(self, rec_variables, crops):
        emb = self._apply_embedder(rec_variables, arcface.preprocess(crops))
        return l2_normalize(emb)

    def _ensure_attr_variables(self):
        """buffalo_l's genderage + 2d106det heads (reference loads the whole
        pack, infrenceServer.py:412-416); lazy so the recognition hot path
        never pays for them unless attributes are requested.

        Two sources, in preference order:
        1. EXACT graphs: converted attr_genderage.onnx / attr_2d106det.onnx
           in the weights dir (tools/convert_onnx.py installs them from a
           buffalo_l pack) executed by models/onnx_exec.OnnxRunner — the
           published topology and weights, jitted onto the MXU.
        2. Capability-parity flax heads with deterministic synthetic
           weights (models/genderage.py, models/landmark106.py) — shape and
           wiring only, used when no pack has been converted.
        """
        if self._attr_variables is None:
            import os

            from ..models import genderage, landmark106
            from ..models.weights import weights_dir

            ga_path = os.path.join(weights_dir(), "attr_genderage.onnx")
            lm_path = os.path.join(weights_dir(), "attr_2d106det.onnx")
            self._attr_runners = None
            if os.path.exists(ga_path) and os.path.exists(lm_path):
                from ..models import onnx_exec, onnxlite

                ga_r = onnx_exec.OnnxRunner(onnxlite.load(ga_path))
                lm_r = onnx_exec.OnnxRunner(onnxlite.load(lm_path))

                def in_size(r, default):
                    shp = r.input_shapes[r.input_names[0]]
                    return int(shp[-1]) if len(shp) == 4 and shp[-1] > 0 \
                        else default

                self._attr_runners = (ga_r, lm_r)
                self._attr_sizes = (in_size(ga_r, genderage.INPUT_SIZE),
                                    in_size(lm_r, landmark106.INPUT_SIZE))
                self._attr_variables = (ga_r.params, lm_r.params)
                return self._attr_variables
            self._ga_model = genderage.GenderAge(dtype=jnp.bfloat16
                                                 if self.cfg.dtype == "bfloat16"
                                                 else jnp.float32)
            self._lm_model = landmark106.Landmark106(dtype=jnp.bfloat16
                                                     if self.cfg.dtype == "bfloat16"
                                                     else jnp.float32)
            ga_vars = load_or_init(
                "genderage", self._ga_model,
                jnp.zeros((1, genderage.INPUT_SIZE, genderage.INPUT_SIZE, 3),
                          jnp.float32), seed=7)
            lm_vars = load_or_init(
                "landmark_2d_106", self._lm_model,
                jnp.zeros((1, landmark106.INPUT_SIZE, landmark106.INPUT_SIZE, 3),
                          jnp.float32), seed=8)
            self._attr_variables = (ga_vars, lm_vars)
        return self._attr_variables

    def _attributes_impl(self, ga_vars, lm_vars, frames_u8, frame_idx, bboxes):
        """Gender/age + 106 landmarks for M boxes (native frame coords).

        Crop geometry is the reference's: a square window centered on the
        bbox covering max(w, h) * 1.5, resampled to the head's input size
        (insightface Attribute.get / Landmark.get); outputs decode as
        gender = argmax(out[:2]), age = round(out[2] * 100), landmarks =
        (out + 1) * size/2 mapped back through the crop affine.
        """
        from ..models import genderage, landmark106
        from ..ops.warp2pass import boxes_to_affines, warp_boxes_two_pass

        if self._attr_runners is not None:
            ga_r, lm_r = self._attr_runners
            ga_size, lm_size = self._attr_sizes
            # exact-graph path: NCHW RGB blobs, mean 0 / std 1 (the
            # insightface blobFromImage settings for these two heads)
            ga_crops = warp_boxes_two_pass(frames_u8, frame_idx, bboxes,
                                           ga_size, scale_factor=1.5)
            ga_out = ga_r.apply(ga_vars,
                                jnp.transpose(ga_crops, (0, 3, 1, 2)))[0]
            lm_crops = warp_boxes_two_pass(frames_u8, frame_idx, bboxes,
                                           lm_size, scale_factor=1.5)
            lm = lm_r.apply(lm_vars,
                            jnp.transpose(lm_crops, (0, 3, 1, 2)))[0]
            lm = lm.reshape(lm.shape[0], -1, 2)
        else:
            ga_size = genderage.INPUT_SIZE
            lm_size = landmark106.INPUT_SIZE
            ga_crops = warp_boxes_two_pass(frames_u8, frame_idx, bboxes,
                                           ga_size, scale_factor=1.5)
            ga_out = self._ga_model.apply(ga_vars,
                                          genderage.preprocess(ga_crops))
            lm_crops = warp_boxes_two_pass(frames_u8, frame_idx, bboxes,
                                           lm_size, scale_factor=1.5)
            lm = self._lm_model.apply(lm_vars, genderage.preprocess(lm_crops))

        gender = jnp.argmax(ga_out[:, :2], axis=1)
        age = jnp.round(ga_out[:, 2] * 100.0)
        # crop-normalized [-1, 1] -> crop pixels -> native frame coords
        half = lm_size / 2.0
        lm_px = (lm + 1.0) * half
        m_inv = boxes_to_affines(bboxes, lm_size, 1.5)
        rot = m_inv[:, :, :2]  # [M, 2, 2]
        trans = m_inv[:, :, 2]  # [M, 2]
        lm_src = jnp.einsum("mij,mkj->mki", rot, lm_px) + trans[:, None, :]
        return gender.astype(jnp.int32), age.astype(jnp.float32), lm_src

    def attributes(self, frames_u8, frame_idx, bboxes):
        """Host API: gender [M], age [M], landmark_2d_106 [M, 106, 2]."""
        ga_vars, lm_vars = self._ensure_attr_variables()
        m = len(frame_idx)
        if m == 0:
            return (np.zeros(0, np.int32), np.zeros(0, np.float32),
                    np.zeros((0, 106, 2), np.float32))
        mb = bucket(m)
        pad_idx = np.zeros(mb, np.int32)
        pad_idx[:m] = frame_idx
        pad_boxes = np.tile(np.array([0, 0, 32, 32], np.float32)[None], (mb, 1))
        pad_boxes[:m] = bboxes
        gender, age, lm = self._attr_jit(
            ga_vars, lm_vars, jnp.asarray(frames_u8), jnp.asarray(pad_idx),
            jnp.asarray(pad_boxes))
        return (np.asarray(gender)[:m], np.asarray(age)[:m],
                np.asarray(lm)[:m])

    def _fused_impl(self, det_variables, rec_variables, frames_u8, det_threshold):
        """One program: detect -> align -> embed at fixed [B, max_faces]."""
        boxes, scores, kps, valid = self._detect_impl(det_variables, frames_u8, det_threshold)
        b = frames_u8.shape[0]
        f = self.cfg.max_faces
        frame_idx = jnp.repeat(jnp.arange(b), f)
        emb = self._embed_impl(rec_variables, frames_u8, frame_idx, kps.reshape(b * f, 5, 2))
        return boxes, scores, kps, valid, emb.reshape(b, f, -1)

    @staticmethod
    def _flatten_fused_outputs(outs):
        """Pack the fused program's 5 outputs into ONE [B, F, 528] f32
        tensor (boxes 4 | score 1 | kps 10 | valid 1 | emb 512) inside the
        jitted program.  On a tunneled TPU each device->host readback pays
        the link round-trip: measured B=4 yuv, five per-output reads cost
        128 ms/batch vs 42 ms for the single packed read — and the resolve
        stage was the streaming pipeline's bottleneck (bench r4:
        3.4 dispatch cycles/s ~= 1 / the 5-read resolve time)."""
        boxes, scores, kps, valid, emb = outs
        b, f = valid.shape
        return jnp.concatenate([
            boxes.astype(jnp.float32),
            scores[..., None].astype(jnp.float32),
            kps.reshape(b, f, 10).astype(jnp.float32),
            valid[..., None].astype(jnp.float32),
            emb.astype(jnp.float32),
        ], axis=-1)

    def _fused_flat_impl(self, det_variables, rec_variables, frames_u8,
                         det_threshold):
        return self._flatten_fused_outputs(self._fused_impl(
            det_variables, rec_variables, frames_u8, det_threshold))

    def _fused_yuv_flat_impl(self, det_variables, rec_variables, frames_y24,
                             det_threshold):
        return self._flatten_fused_outputs(self._fused_yuv_impl(
            det_variables, rec_variables, frames_y24, det_threshold))

    # ------------------------------------------------------------- host API
    def detect(self, frames_u8, det_threshold: float = 0.3) -> DetectionBatch:
        """frames_u8: [B, H, W, 3] RGB uint8 at the det canvas size."""
        boxes, scores, kps, valid = self._detect_jit(
            self.det_variables, jnp.asarray(frames_u8), jnp.float32(det_threshold)
        )
        return DetectionBatch(
            np.asarray(boxes), np.asarray(scores), np.asarray(kps), np.asarray(valid)
        )

    def embed_faces(self, frames_u8, frame_idx, kps) -> np.ndarray:
        """Embed M faces found in a batch of native-resolution frames.

        frames_u8: [B, H, W, 3] RGB uint8 (native resolution).
        frame_idx: [M] int32 — frame each face belongs to.
        kps:       [M, 5, 2] float32 landmarks in native coords.

        Returns [M, 512] float32 L2-normalized embeddings.
        """
        m = len(frame_idx)
        if m == 0:
            return np.zeros((0, self.cfg.embed_dim), np.float32)
        mb = bucket(m)
        pad_idx = np.zeros(mb, np.int32)
        pad_idx[:m] = frame_idx
        pad_kps = np.tile(np.asarray(ARCFACE_DST, np.float32)[None], (mb, 1, 1))
        pad_kps[:m] = kps
        emb = self._embed_jit(
            self.rec_variables, jnp.asarray(frames_u8), jnp.asarray(pad_idx),
            jnp.asarray(pad_kps),
        )
        return np.asarray(emb)[:m]

    def detect_align_embed(self, frames_u8, det_threshold: float = 0.3):
        """Fully-fused fixed-capacity variant (benchmark / compile-check)."""
        return self._fused_jit(
            self.det_variables, self.rec_variables, jnp.asarray(frames_u8),
            jnp.float32(det_threshold),
        )

    def detect_align_embed_flat(self, frames_u8, det_threshold: float = 0.3):
        """Serving variant returning ONE [B, F, 528] device tensor
        (boxes|score|kps|valid|emb — _flatten_fused_outputs) so the caller
        pays a single device->host transfer instead of five; the streaming
        resolve stage is ~3x faster on a tunneled link."""
        return self._fused_flat_jit(
            self.det_variables, self.rec_variables, jnp.asarray(frames_u8),
            jnp.float32(det_threshold),
        )

    def detect_align_embed_yuv420_flat(self, frames_y24_u8,
                                       det_threshold: float = 0.3):
        """Flat-output variant of detect_align_embed_yuv420 (see
        detect_align_embed_flat)."""
        if not self._has_packed_stem():
            raise ValueError(
                "yuv420 input needs the packed-stem weights (detector built "
                "without batch_stats?)")
        return self._fused_yuv_flat_jit(
            self.det_variables, self.rec_variables,
            jnp.asarray(frames_y24_u8), jnp.float32(det_threshold),
        )

    def _has_packed_stem(self) -> bool:
        """Whether the packed-input programs can run: the selected
        packed_stem_impl's prerequisites are present ("unpack" runs the
        raw program and needs nothing extra)."""
        if self.cfg.packed_stem_impl == "unpack":
            return True
        if self.cfg.packed_stem_impl == "xla":
            return "packed_stem_s2d4" in self.det_variables
        return "stem_pallas" in self.det_variables

    @staticmethod
    def pack_frames(frames_u8) -> np.ndarray:
        """Host-side s2d4 pack: [B, H, W, 3] u8 -> [B, H/4, W/4, 48].

        Batched wrapper over native.pack_s2d4 (the single owner of the
        (p*4+q)*C+c layout contract, C++ with a numpy fallback) for tests
        and sources that already hold raw canvases; production sources get
        the same bytes from native letterbox_s2d4 at pixel-writing time.
        """
        from .. import native

        f = np.asarray(frames_u8)
        return np.stack([native.pack_s2d4(frame) for frame in f])

    def detect_align_embed_yuv420(self, frames_y24_u8,
                                  det_threshold: float = 0.3):
        """Fused program on packed-YUV420 frames [B, H/4, W/4, 24] — the
        streaming wire format (native letterbox_yuv420_s2d4 emits it at
        1.5 B/px, HALF of RGB).  Same outputs as detect_align_embed up to
        4:2:0 chroma subsampling of the input pixels."""
        if not self._has_packed_stem():
            raise ValueError(
                "yuv420 input needs the packed-stem weights (detector built "
                "without batch_stats?)")
        return self._fused_yuv_jit(
            self.det_variables, self.rec_variables,
            jnp.asarray(frames_y24_u8), jnp.float32(det_threshold),
        )

    def detect_align_embed_packed(self, frames_p4_u8, det_threshold: float = 0.3):
        """Fused program on s2d4-packed u8 frames [B, H/4, W/4, 48] — the
        production serving contract (hosts pack for free at letterbox
        time; the fused Pallas stem then runs without any on-device
        relayout).  Same outputs as detect_align_embed."""
        if not self._has_packed_stem():
            raise ValueError(
                "packed input needs the packed-stem weights (detector built "
                "without batch_stats?)")
        return self._fused_packed_jit(
            self.det_variables, self.rec_variables, jnp.asarray(frames_p4_u8),
            jnp.float32(det_threshold),
        )

    def make_sharded_fused(self, mesh, variant: str = "raw"):
        """Data-parallel fused program over a mesh's 'data' axis.

        Model variables replicate; the frame batch shards over 'data', so N
        chips serve N x the single-chip throughput with no cross-chip
        communication (detection is embarrassingly parallel over frames —
        the collectives live in the gallery match, parallel/topk.py).

        ``variant`` selects the serving contract:
          "raw"      — fn(frames_u8 [B, H, W, 3]) -> 5 outputs
          "flat"     — fn(frames_u8 [B, H, W, 3]) -> one [B, F, 528]
          "yuv_flat" — fn(frames_y24 [B, rows<=H/4, W/4, 24]) -> [B, F, 528]
                       (the streaming wire format + single-readback output)
        B must be divisible by the data-axis size.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        replicated = NamedSharding(mesh, P())
        batch_sh = NamedSharding(mesh, P("data", None, None, None))
        det_vars = jax.device_put(self.det_variables, replicated)
        rec_vars = jax.device_put(self.rec_variables, replicated)
        impl = {"raw": self._fused_impl,
                "flat": self._fused_flat_impl,
                "yuv_flat": self._fused_yuv_flat_impl}[variant]
        fused = jax.jit(impl,
                        in_shardings=(replicated, replicated, batch_sh, None),
                        static_argnums=())

        def run(frames_u8, det_threshold: float = 0.3):
            frames = jax.device_put(jnp.asarray(frames_u8), batch_sh)
            return fused(det_vars, rec_vars, frames, jnp.float32(det_threshold))

        return run
