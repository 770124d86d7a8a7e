"""FaceAnalysis-compatible facade over the TPU engine.

The reference constructs ``insightface.app.FaceAnalysis(name="buffalo_l")``
and calls ``.prepare(ctx_id)`` / ``.get(frame)`` everywhere
(reference infrenceServer.py:409-416/528, trainingServer.py:130-142/227,
peopleCount.py:832-841/857).  This module provides the same call surface:
``get`` returns ``Face`` objects with ``.bbox``, ``.det_score``, ``.kps``
and ``.normed_embedding`` — but the compute path is the jitted SCRFD +
alignment + IResNet pipeline (engine/pipeline.py) instead of ONNX Runtime.

``FakeFaceAnalysis`` is the deterministic test double (SURVEY.md §4c): it
decodes a face descriptor hidden in the image pixels, so domain logic
(enrollment state machine, campus counting, clustering) is testable without
model weights.  Marker format produced by ``encode_fake_face``.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np

from ..core.config import EngineConfig, get_config
from ..ops.align import ARCFACE_DST


@dataclass
class Face:
    bbox: np.ndarray  # [4] xyxy, original frame coords
    det_score: float
    kps: np.ndarray  # [5, 2]
    normed_embedding: np.ndarray = field(default=None)  # [512] unit norm
    gender: int | None = None
    age: int | None = None
    landmark_2d_106: np.ndarray | None = None


def letterbox(frame: np.ndarray, canvas_hw: tuple) -> tuple:
    """Resize-with-aspect onto a zero canvas (insightface det convention);
    returns (canvas uint8, scale) with coords_canvas = coords_orig * scale.
    Uses the framework's native C++ resampler (native/imagecodec.cc)."""
    from .. import native

    canvas, scale = native.letterbox(np.ascontiguousarray(frame), *canvas_hw)
    return canvas, scale


class FaceAnalysis:
    """TPU-backed implementation of the insightface facade."""

    def __init__(self, name: str = "buffalo_l", cfg: EngineConfig | None = None,
                 engine=None, allowed_modules=None, **_):
        self.name = name
        self.cfg = cfg or get_config().engine
        self._engine = engine
        self.det_thresh = 0.3
        # insightface runs every model in the pack per face; buffalo_l =
        # detection + recognition + genderage + 2d106 landmarks.  Pass
        # e.g. ("detection", "recognition") to trim the per-frame work.
        self.allowed_modules = tuple(allowed_modules) if allowed_modules else (
            "detection", "recognition", "genderage", "landmark_2d_106")

    def prepare(self, ctx_id: int = 0, det_size: tuple | None = None,
                det_thresh: float = 0.3):
        if det_size is not None and tuple(det_size) != tuple(self.cfg.det_size):
            import dataclasses

            self.cfg = dataclasses.replace(self.cfg, det_size=tuple(det_size))
            self._engine = None
        self.det_thresh = det_thresh
        self._ensure_engine()

    def _ensure_engine(self):
        if self._engine is None:
            from ..engine.pipeline import FaceEngine

            # pack name selects the recognizer: buffalo_l -> ArcFace-R50,
            # mobile_facenet_v1 -> MobileFaceNet (named in the reference's
            # ALLOWED_MODELS, app/config/config.py:24, but never served)
            rec_arch = ("mobilefacenet" if "facenet" in self.name
                        else "r50")
            self._engine = FaceEngine(self.cfg, rec_arch=rec_arch)
        return self._engine

    def get(self, frame: np.ndarray, max_num: int = 0) -> list:
        """BGR uint8 frame -> list of Face (insightface contract)."""
        faces_batch = self.get_batch([frame], max_num=max_num)
        return faces_batch[0]

    @staticmethod
    def _faces_from_fused_flat(flat, n: int, max_num: int) -> list:
        """Decode the engine's single packed [B, F, 528] output
        (pipeline._flatten_fused_outputs) — ONE device->host transfer per
        batch; on the tunneled TPU the five per-output reads of
        _faces_from_fused measured 128 ms/batch vs 42 ms packed, and that
        resolve time was the streaming pipeline's rate limiter."""
        flat = np.asarray(flat)
        b, f, _ = flat.shape
        return FaceAnalysis._faces_from_fused(
            (flat[..., :4], flat[..., 4], flat[..., 5:15].reshape(b, f, 5, 2),
             flat[..., 15] > 0.5, flat[..., 16:]), n, max_num)

    @staticmethod
    def _faces_from_fused(outputs, n: int, max_num: int) -> list:
        boxes, det_scores, kps, valid, emb = (np.asarray(o) for o in outputs)
        per_frame = []
        for b in range(n):
            faces = []
            for f in range(valid.shape[1]):
                if not valid[b, f]:
                    continue
                face = Face(bbox=boxes[b, f], det_score=float(det_scores[b, f]),
                            kps=kps[b, f])
                face.normed_embedding = emb[b, f]
                faces.append(face)
            if max_num:
                faces = faces[:max_num]
            per_frame.append(faces)
        return per_frame

    def _get_batch_fused(self, engine, stacked, scales,
                         max_num: int) -> list:
        """One detect+align+embed program, one pixel upload (scale==1 only),
        one packed result download."""
        flat = engine.detect_align_embed_flat(
            stacked, det_threshold=self.det_thresh)
        per_frame = self._faces_from_fused_flat(flat, len(scales), max_num)
        if ("genderage" in self.allowed_modules
                or "landmark_2d_106" in self.allowed_modules):
            self._attach_attributes(engine, stacked, per_frame)
        return per_frame

    # ---------------------------------------------------- yuv420 transport
    def _yuv_eligible(self, engine, frames) -> bool:
        """Half-byte transport path: fused embed serving at scale==1.0 (the
        640x480-camera case), attributes off (they crop raw canvases)."""
        if (self.cfg.stream_transport != "yuv420"
                or "recognition" not in self.allowed_modules
                or "genderage" in self.allowed_modules
                or "landmark_2d_106" in self.allowed_modules
                or not engine._has_packed_stem()):
            return False
        dh, dw = self.cfg.det_size
        # scale must be exactly 1.0 (canvas == native coords, same condition
        # as the rgb fused path)
        return all(
            (f.ndim == 3 and f.shape[-1] == 24)  # already encoded
            or min(dh / f.shape[0], dw / f.shape[1]) == 1.0
            for f in frames)

    def encode_frame(self, frame_bgr: np.ndarray) -> np.ndarray:
        """Encode one camera frame into the configured wire format on the
        CAPTURE thread (ctypes releases the GIL, so N cameras pack in
        parallel), so the dispatch thread ships 1.5 B/px instead of 3.
        Returns the frame unchanged for the rgb transport."""
        if self.cfg.stream_transport != "yuv420":
            return frame_bgr
        from .. import native

        dh, dw = self.cfg.det_size
        rgb = np.ascontiguousarray(frame_bgr[..., ::-1])
        packed, scale = native.letterbox_yuv420_s2d4(rgb, dh, dw)
        if scale != 1.0:
            return frame_bgr  # upscaled letterbox: keep the exact rgb path
        # Ship only the content rows: the letterbox writes the frame at the
        # top-left, so rows >= ceil(nh/4) are all padding — for a 640x480
        # camera on a 640x640 canvas that is 25% of the wire bytes.  The
        # device re-pads with YUV black (engine detect_align_embed_yuv420).
        nh4 = min((frame_bgr.shape[0] + 3) // 4, packed.shape[0])
        packed = np.ascontiguousarray(packed[:nh4])
        if self.cfg.upload_on_submit:
            import jax.numpy as jnp

            return jnp.asarray(packed)  # upload NOW, on the capture thread
        return packed

    def _decode_mixed_packs(self, frames: list) -> list:
        """A batch mixing YUV packs with raw BGR frames (cameras at
        different resolutions: encode_frame falls back to raw for
        letterbox scale != 1.0) fails _yuv_eligible and lands on the
        raw-frame paths — which expect HxWx3.  Decode any 24-channel packs
        back to BGR content rows host-side so every downstream path sees
        plain camera frames (the 4:2:0 chroma loss was paid at encode)."""
        if not any(getattr(f, "ndim", 0) == 3 and f.shape[-1] == 24
                   for f in frames):
            return frames
        from ..ops.yuv import yuv420p4_to_rgb_host

        out = []
        for f in frames:
            if f.ndim == 3 and f.shape[-1] == 24:
                rgb = yuv420p4_to_rgb_host(np.asarray(f))
                out.append(np.ascontiguousarray(rgb[..., ::-1]))  # BGR
            else:
                out.append(f)
        return out

    def _get_batch_fused_yuv(self, engine, frames, max_num: int) -> list:
        from ..engine.pipeline import bucket

        dh, dw = self.cfg.det_size
        packs = [f if f.shape[-1] == 24 else self.encode_frame(f)
                 for f in frames]
        stacked = self._stack_yuv(packs, dw)
        flat = engine.detect_align_embed_yuv420_flat(
            stacked, det_threshold=self.det_thresh)
        return self._faces_from_fused_flat(flat, len(frames), max_num)

    @staticmethod
    def _stack_yuv(packs, dw):
        """Stack content-row YUV packs into one [nb, rows, dw/4, 24] batch.
        Unfilled area is YUV black (Y=0, U=V=128) — zero chroma would
        decode to green and could seed spurious detections.

        Device-resident packs (upload_on_submit: capture threads already
        device_put each frame) are stacked ON DEVICE — no download, no
        re-upload; the dispatch thread's only work is one small concat
        program."""
        from ..engine.pipeline import bucket

        import jax
        import jax.numpy as jnp

        nb = bucket(len(packs))
        if any(isinstance(p, jax.Array) for p in packs):
            if len({tuple(p.shape) for p in packs}) == 1:
                stacked = jnp.stack([jnp.asarray(p) for p in packs])
                if nb > len(packs):
                    black = jnp.tile(
                        jnp.asarray([0] * 16 + [128] * 8, jnp.uint8),
                        (nb - len(packs),) + tuple(stacked.shape[1:3]) + (1,))
                    stacked = jnp.concatenate([stacked, black], axis=0)
                return stacked
            packs = [np.asarray(p) for p in packs]  # mixed shapes: host path
        rows = max(p.shape[0] for p in packs)
        stacked = np.zeros((nb, rows, dw // 4, 24), np.uint8)
        stacked[..., 16:] = 128
        for i, p in enumerate(packs):
            stacked[i, :p.shape[0]] = p
        return stacked

    def get_batch_async(self, frames: list, max_num: int = 0):
        """Dispatch a batch WITHOUT blocking on device results.

        Returns ``resolve() -> list[list[Face]]``.  JAX dispatch is async,
        so the caller (engine/microbatch.py) can prep + upload the NEXT
        batch while the device chews on this one (double-buffering: the
        host->device transfer — the streaming bottleneck — overlaps device
        compute instead of serializing with it).  Falls back to synchronous
        evaluation for the non-fused paths."""
        if not frames:
            return lambda: []
        engine = self._ensure_engine()
        if self._yuv_eligible(engine, frames):
            dh, dw = self.cfg.det_size
            packs = [f if f.shape[-1] == 24 else self.encode_frame(f)
                     for f in frames]
            stacked = self._stack_yuv(packs, dw)
            flat = engine.detect_align_embed_yuv420_flat(
                stacked, det_threshold=self.det_thresh)
            n = len(frames)
            return lambda: self._faces_from_fused_flat(flat, n, max_num)
        frames = self._decode_mixed_packs(frames)
        want_embed = "recognition" in self.allowed_modules
        want_attrs = ("genderage" in self.allowed_modules
                      or "landmark_2d_106" in self.allowed_modules)
        dh, dw = self.cfg.det_size
        if (want_embed and not want_attrs
                and all(min(dh / f.shape[0], dw / f.shape[1]) == 1.0
                        for f in frames)):
            from ..engine.pipeline import bucket

            nb = bucket(len(frames))
            stacked = np.zeros((nb, dh, dw, 3), np.uint8)
            for i, f in enumerate(frames):
                canvas, _ = letterbox(f[..., ::-1], self.cfg.det_size)
                stacked[i] = canvas
            flat = engine.detect_align_embed_flat(
                stacked, det_threshold=self.det_thresh)
            n = len(frames)
            return lambda: self._faces_from_fused_flat(flat, n, max_num)
        results = self.get_batch(frames, max_num=max_num)
        return lambda: results

    def _attach_attributes(self, engine, batch, per_frame):
        flat_faces = [face for faces in per_frame for face in faces]
        if not flat_faces:
            return
        idx_arr = np.asarray(
            [b for b, faces in enumerate(per_frame) for _ in faces], np.int32)
        boxes = np.stack([f.bbox for f in flat_faces]).astype(np.float32)
        gender, age, lm = engine.attributes(batch, idx_arr, boxes)
        for i, face in enumerate(flat_faces):
            if "genderage" in self.allowed_modules:
                face.gender = int(gender[i])
                face.age = int(age[i])
            if "landmark_2d_106" in self.allowed_modules:
                face.landmark_2d_106 = lm[i]

    def get_batch(self, frames: list, max_num: int = 0) -> list:
        """Batched variant (the TPU-native entry the micro-batcher uses)."""
        from ..engine.pipeline import bucket

        if not frames:
            return []
        engine = self._ensure_engine()
        if self._yuv_eligible(engine, frames):
            return self._get_batch_fused_yuv(engine, frames, max_num)
        frames = self._decode_mixed_packs(frames)
        canvases = []
        scales = []
        rgb_frames = []
        for frame in frames:
            rgb = frame[..., ::-1]  # reference feeds BGR; models expect RGB
            canvas, scale = letterbox(rgb, self.cfg.det_size)
            canvases.append(canvas)
            scales.append(scale)
            rgb_frames.append(rgb)
        # Pad to a bucketed batch size: XLA compiles one program per shape,
        # and a varying camera count must not trigger fresh compiles
        # mid-stream (minutes over a tunneled runtime).
        nb = bucket(len(canvases))
        stacked = np.zeros((nb,) + tuple(canvases[0].shape), np.uint8)
        for i, cv in enumerate(canvases):
            stacked[i] = cv

        # When every frame fits the canvas unscaled (scale == 1.0, the
        # 640x480-camera common case) the canvas IS the native frame, so the
        # fully-fused single-program path is exact AND uploads the pixels
        # once instead of twice (detect canvases + embed frames) — the
        # dominant cost when the host<->device link is thin.
        want_embed = "recognition" in self.allowed_modules
        if want_embed and all(s == 1.0 for s in scales):
            return self._get_batch_fused(engine, stacked, scales, max_num)
        det = engine.detect(stacked, det_threshold=self.det_thresh)

        # collect all faces across frames, map coords back to native frames
        all_idx, all_kps, per_frame = [], [], []
        for b, scale in enumerate(scales):
            faces = []
            for f in range(det.valid.shape[1]):
                if not det.valid[b, f]:
                    continue
                faces.append(Face(
                    bbox=det.boxes[b, f] / scale,
                    det_score=float(det.scores[b, f]),
                    kps=det.kps[b, f] / scale,
                ))
            if max_num:
                faces = faces[:max_num]
            per_frame.append(faces)
            for i, face in enumerate(faces):
                all_idx.append(b)
                all_kps.append(face.kps)

        if all_idx:
            # embed from native-resolution frames, padded to a common shape
            # AND a bucketed batch count (compile-shape stability, as above)
            max_h = max(f.shape[0] for f in rgb_frames)
            max_w = max(f.shape[1] for f in rgb_frames)
            max_h += (-max_h) % 8
            max_w += (-max_w) % 8
            batch = np.zeros((bucket(len(rgb_frames)), max_h, max_w, 3), np.uint8)
            for i, f in enumerate(rgb_frames):
                batch[i, :f.shape[0], :f.shape[1]] = f
            idx_arr = np.asarray(all_idx, np.int32)
            flat_faces = [face for faces in per_frame for face in faces]
            if "recognition" in self.allowed_modules:
                emb = engine.embed_faces(batch, idx_arr,
                                         np.stack(all_kps).astype(np.float32))
                for face, e in zip(flat_faces, emb):
                    face.normed_embedding = e
            if ("genderage" in self.allowed_modules
                    or "landmark_2d_106" in self.allowed_modules):
                self._attach_attributes(engine, batch, per_frame)
        return per_frame


# --------------------------------------------------------------- test fake
MARKER = np.array([17, 103, 229], np.uint8)


def encode_fake_face(person_seed: int, pose_jitter: float = 0.0,
                     bbox=(100, 100, 200, 220), size=(480, 640),
                     score: float = 0.9) -> np.ndarray:
    """Create a BGR image carrying one fake face descriptor in its pixels.

    ``person_seed`` determines the identity embedding; ``pose_jitter`` adds
    per-image rotation of the embedding (0.0 = identical across poses, large
    values make poses look like different people)."""
    if not 0 <= person_seed < (1 << 24):
        # the descriptor carries the seed in 3 unsigned LE bytes; a bigger
        # or negative seed would silently decode to a DIFFERENT identity
        # and produce baffling no-match test failures
        raise ValueError(
            f"person_seed must be in [0, 2^24), got {person_seed}")
    img = np.random.default_rng(person_seed * 7919 + int(pose_jitter * 1e4)) \
        .integers(0, 255, (*size, 3)).astype(np.uint8)
    img[0, 0] = MARKER
    img[0, 1] = np.frombuffer(np.int32(person_seed).tobytes()[:3], np.uint8)
    img[0, 2] = np.clip([pose_jitter * 100, score * 255, 1], 0, 255).astype(np.uint8)
    x1, y1, x2, y2 = bbox
    img[0, 3] = [x1 // 4, y1 // 4, x2 // 4]
    img[0, 4] = [y2 // 4, 0, 0]
    return img


def fake_embedding(person_seed: int, pose_jitter: float = 0.0) -> np.ndarray:
    """Deterministic unit embedding; jitter rotates it away from the base."""
    rng = np.random.default_rng(int(person_seed))
    base = rng.normal(size=512).astype(np.float32)
    base /= np.linalg.norm(base)
    if pose_jitter:
        noise_rng = np.random.default_rng(int(person_seed) * 31 + 7)
        noise = noise_rng.normal(size=512).astype(np.float32)
        noise -= noise @ base * base
        noise /= np.linalg.norm(noise)
        vec = np.cos(pose_jitter) * base + np.sin(pose_jitter) * noise
        return vec / np.linalg.norm(vec)
    return base


class FakeFaceAnalysis:
    """Deterministic detector/embedder reading descriptors from pixels."""

    def __init__(self, *_, **__):
        pass

    def prepare(self, *_, **__):
        pass

    def get(self, frame: np.ndarray, max_num: int = 0) -> list:
        if frame.shape[0] < 1 or frame.shape[1] < 5:
            return []
        if not np.array_equal(frame[0, 0], MARKER):
            return []
        seed = int.from_bytes(bytes(frame[0, 1].tolist()) + b"\x00", "little")
        jitter = float(frame[0, 2, 0]) / 100.0
        score = float(frame[0, 2, 1]) / 255.0
        x1, y1, x2 = (int(v) * 4 for v in frame[0, 3])
        y2 = int(frame[0, 4, 0]) * 4
        kps = (np.asarray(ARCFACE_DST) * (x2 - x1) / 112.0
               + np.array([x1, y1], np.float32))
        return [Face(bbox=np.array([x1, y1, x2, y2], np.float32),
                     det_score=score,
                     kps=kps.astype(np.float32),
                     normed_embedding=fake_embedding(seed, jitter))]

    def get_batch(self, frames: list, max_num: int = 0) -> list:
        return [self.get(f, max_num) for f in frames]
