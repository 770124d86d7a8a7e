"""Typed configuration tree.

Replaces the reference's scattered configuration — the env-backed ``Config``
class (reference app/config/config.py:1-24), the ``WorkerConfig`` dataclass
(reference trainingServer.py:58-71), and the many inline magic numbers
(thresholds at infrenceServer.py:406-407, peopleCount.py:829-830/232,
debounce at peopleCount.py:144-185, batching at peopleCount.py:249-251) —
with one dataclass tree, overridable from the environment.

The reference hardcodes a production MongoDB credential as the URI default
(app/config/config.py:8); we deliberately default to the embedded store
(``memory://``) instead.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any


def _env(name: str, default: Any, cast=None):
    raw = os.environ.get(name)
    if raw is None:
        return default
    if cast is bool:
        return raw.strip().lower() in ("1", "true", "yes", "on")
    if cast is None:
        cast = type(default) if default is not None else str
    try:
        return cast(raw)
    except (TypeError, ValueError):
        return default


@dataclass
class DBConfig:
    """Datastore endpoints (reference app/config/config.py:5-14)."""

    # "memory://" selects the embedded store; "file:///dir" persists it;
    # "fre://host:port" shares one embedded store across processes via
    # store.server; a mongodb:// URI selects pymongo when installed.
    # Never default to a remote credentialed URI.
    mongodb_uri: str = field(default_factory=lambda: _env("MONGODB_URI", "memory://"))
    database_name: str = field(default_factory=lambda: _env("DATABASE_NAME", "bharatlytics"))
    # Optional on-disk persistence dir for the embedded store ("" = RAM only).
    persist_dir: str = field(default_factory=lambda: _env("FRE_PERSIST_DIR", ""))


@dataclass
class APIConfig:
    """REST serving knobs (reference app/config/config.py:15-24, employee.py:51-52)."""

    host: str = field(default_factory=lambda: _env("HOST", "0.0.0.0"))
    port: int = field(default_factory=lambda: _env("PORT", 5000, int))
    debug: bool = field(default_factory=lambda: _env("DEBUG", False, bool))
    url_prefix: str = "/bharatlytics/v1"
    allowed_extensions: tuple = ("png", "jpg", "jpeg")
    # Reference queues one embedding job per model in ALLOWED_MODELS
    # (app/api/employee.py:163-178, app/config/config.py:24).
    allowed_models: tuple = ("buffalo_l", "mobile_facenet_v1")
    rate_limit_requests: int = 100  # employee.py:51
    rate_limit_window_s: float = 60.0  # employee.py:52


@dataclass
class ThresholdConfig:
    """All match/cluster thresholds (reference citations inline)."""

    detection: float = 0.3  # infrenceServer.py:406
    recognition: float = 0.4  # infrenceServer.py:407
    counting_recognition: float = 0.45  # peopleCount.py:829
    definitely_unknown: float = 0.35  # peopleCount.py:830
    unknown_cluster_join: float = 0.65  # peopleCount.py:232
    same_person: float = 0.4  # trainingServer.py:70
    duplicate_face: float = 0.4  # trainingServer.py:71


@dataclass
class EngineConfig:
    """TPU pipeline knobs (new; no reference equivalent)."""

    # Detector input canvas (bucketed static shape fed to the jitted program).
    det_size: tuple = (640, 640)
    # Max detections kept per frame after NMS (static shape requirement).
    max_faces: int = 32
    # Pre-NMS candidate count (top-k over anchor scores).
    pre_nms_topk: int = 512
    nms_iou: float = 0.4
    # Embedder crop size (ArcFace convention).
    embed_size: int = 112
    # Compute dtype for conv/matmul paths.
    dtype: str = "bfloat16"
    # Micro-batching: max frames per dispatch and max wait to fill a batch.
    microbatch_max: int = 8
    microbatch_window_ms: float = 4.0
    # Frame-queue depth per camera before dropping (infrenceServer.py:629).
    frame_queue_depth: int = 2
    # Batches in flight beyond the one being dispatched (microbatch.py):
    # 1 = classic double-buffering (upload k+1 overlaps compute/resolve k);
    # 2 adds a pipeline stage — ~15% more sustained fps on a transfer-bound
    # link at the cost of one extra batch-cycle of p50 latency.
    inflight_batches: int = 1
    # Upload each frame to the device from its CAPTURE thread (inside
    # MicroBatcher.submit's prepare hook) instead of as one stacked batch
    # on the dispatch thread.  N cameras' uploads then pipeline into the
    # link while batches assemble on device, so the batch cycle shrinks to
    # roughly compute + dispatch overheads.  Admission control applies:
    # a frame is only uploaded if its camera slot has room.
    upload_on_submit: bool = False
    # Adaptive streaming (the link's real bandwidth swings ~3-30 MB/s
    # between runs; fixed knob profiles are a per-run lottery).  When
    # stream_profile="auto", the MicroBatcher measures per-frame
    # submit->resolve latency online and retunes frame_queue_depth /
    # inflight_batches every adapt_interval_s: tighten one knob when the
    # window p50 overshoots target_p50_ms; when p50 is comfortably under
    # target AND frames are being dropped, trial-loosen one knob and keep
    # it only if throughput actually improved.  Drop-on-full admission
    # semantics (reference infrenceServer.py:594-598) are preserved at
    # every depth the controller picks.
    stream_profile: str = "static"  # "static" | "auto"
    target_p50_ms: float = 300.0
    adapt_interval_s: float = 2.0
    # Gallery capacity per shard bucket (static shapes; grows by doubling).
    gallery_block: int = 1024
    embed_dim: int = 512
    # Gallery matrix dtype on device: "float32" | "bfloat16" | "int8".
    # float32 keeps scores bit-exact with the reference's np.dot decisions
    # (the parity default).  The k=1 TPU match runs ops/match_pallas's
    # fused single-pass kernel, which is HBM-bandwidth-bound on the gallery
    # bytes alone — so smaller dtypes now genuinely pay (v5e, 1M IDs,
    # batch 64): f32 2.6 ms, bf16 1.33 ms (~3e-3 cosine err), int8 0.72 ms
    # (~1.6e-3 score err, global-scale symmetric quantization;
    # near-tie top-1 decisions can flip — opt-in for scale, not parity).
    # (The earlier "bf16 NOT faster" observation was an XLA-path artifact:
    # its f32 [B, N] score tensor traffic hid the gallery saving.)
    gallery_dtype: str = "float32"
    # Evaluate the SCRFD backbone stem in space-to-depth packed layout
    # via XLA (models/packed_stem.py).  Measured on v5e B=8 640x640 bf16:
    # packed 2.94 ms vs XLA's own lowering of the unpacked stem 2.56 ms —
    # XLA already handles the low-channel stem well, and the packed form's
    # 4x nominal MACs are NOT fully hidden by lane padding.  Kept as an
    # opt-in documented experiment (exactness pinned by
    # tests/test_packed_stem.py); default off because it loses in situ.
    packed_stem: bool = False
    # Fused Pallas stem kernel (ops/stem_pallas.py): the whole SCRFD stem
    # (3 convs + max-pool) in one VMEM-resident kernel.  Isolated (v5e,
    # B=8 640x640): XLA stem 3.09 ms, kernel 2.65 ms from raw frames
    # (~1.1 ms of that is the on-device u8 space-to-depth transpose —
    # XLA is poor at byte-granular transposes), 1.55 ms from host-packed
    # s2d4 frames (pad_packed_u8).  In situ, however, a same-process A/B
    # of the full detect program measured the kernel path ~1.1 ms SLOWER
    # (7.5-7.9 vs 6.4-6.8 ms) — in context XLA fuses/lays out the stem
    # better than isolated probes suggest, and only the host-packed
    # variant beats it, which the fused pipeline cannot use because the
    # warp atlas needs raw-layout pixels.  Default off; "on" exists for
    # packed-input detect-only deployments and for re-measurement.
    stem_kernel: str = "off"  # "auto" (TPU only) | "on" | "off"
    # Strategy for PACKED-INPUT programs (detect_align_embed_packed /
    # _yuv420, the streaming wire formats).  Round-4 in-situ detect at
    # B=96 640x640 v5e (benchmarks/packed_insitu.py; raw frames 39.7 ms):
    # - "unpack" (41.9 ms): on-device u8 depth-to-space, then the RAW
    #   program — XLA fuses the unpermute into the stem's input
    #   preprocessing, so packed wire bytes cost ~2 ms of device time.
    # - "xla" (67.5 ms): stem evaluated packed as three plain XLA convs
    #   (models/packed_stem.packed_stem_forward_s2d4) + packed-atlas warp;
    #   packed conv2/3 genuinely pay 4x MACs.
    # - "pallas" (92.1 ms): VMEM-resident fused stem kernel
    #   (ops/stem_pallas.fused_stem) + packed-atlas warp.  Wins isolated
    #   (stem 21.8 ms vs backbone-from-argument 25.6 ms) but the custom
    #   call is an optimization barrier: the backbone consuming its output
    #   ran 88.7 ms vs 36.6 ms from an XLA-produced stem — a +41 ms
    #   composition penalty no isolated probe shows.
    packed_stem_impl: str = "unpack"  # "unpack" | "xla" | "pallas"
    # Host->device frame transport for the batched serving path:
    # "rgb" uploads raw letterboxed canvases (3 B/px, the parity default);
    # "yuv420" uploads packed 4:2:0 YUV (1.5 B/px — half the bytes on the
    # link that bottlenecks streaming, BENCH_r02) which the device undoes
    # with one constant matmul (ops/yuv.py) before the fused packed
    # program.  Pixel cost: chroma subsampling (visually lossless for
    # faces; embeddings cosine >=0.99 vs rgb on smooth imagery).
    stream_transport: str = "rgb"  # "rgb" | "yuv420"
    # int8 PTQ embedder (models/quant.py): opt-in scale mode like the
    # int8 gallery — measured 1.71x embed throughput on v5e (10.16 ->
    # 5.96 ms per 128 crops) at >=0.995 cosine vs bf16.  NOT the parity
    # path (default off).
    embed_int8: bool = False
    # int8 PTQ detector backbone (models/quant.scrfd_backbone_forward):
    # same scheme for the SCRFD ResNetV1e (neck/head stay float).
    # MEASURED SLOWER on v5e: detect+nms 9.88 ms int8 vs 6.81 ms bf16 at
    # B=8 — on the detector's large thin-channel maps the per-layer
    # quantize/dequantize VPU chains outweigh the int8 MXU gain, and the
    # functional twin loses XLA's fused ConvBN lowering (the embedder
    # wins 1.71x because its FLOPs/byte is ~5x higher).  Kept opt-in as
    # a documented negative result; default off.
    det_int8: bool = False


@dataclass
class SyncConfig:
    """Gallery sync cadences (infrenceServer.py:55, peopleCount.py:710)."""

    inference_sync_s: float = 30.0
    counting_sync_s: float = 60.0


@dataclass
class WorkerConfig:
    """Enrollment worker tunables (reference trainingServer.py:58-71)."""

    poll_interval_s: float = 2.0  # :65
    batch_size: int = 5  # :64
    max_workers: int = 3  # :66
    max_retries: int = 3  # :62
    heartbeat_s: float = 10.0  # :63
    stuck_job_timeout_s: float = 1800.0  # :69 (30 min)
    stuck_scan_interval_s: float = 300.0  # trainingServer.py:548
    cpu_backpressure_pct: float = 90.0  # :80-97
    mem_backpressure_pct: float = 85.0
    model_name: str = "buffalo_l"


@dataclass
class CampusConfig:
    """Entry/exit state machine knobs (reference peopleCount.py)."""

    confirm_delay_s: float = 2.0  # :144,161 second detection >=2s later
    pending_expiry_s: float = 5.0  # :178-185
    batch_size: int = 50  # :249
    batch_interval_s: float = 5.0  # :251
    analytics_interval_s: float = 60.0  # :589-626
    unknown_history: int = 10  # deque(maxlen=10) :68
    frame_skip: int = 2  # :938
    max_camera_errors: int = 10  # :944-945


@dataclass
class Config:
    db: DBConfig = field(default_factory=DBConfig)
    api: APIConfig = field(default_factory=APIConfig)
    thresholds: ThresholdConfig = field(default_factory=ThresholdConfig)
    engine: EngineConfig = field(default_factory=EngineConfig)
    sync: SyncConfig = field(default_factory=SyncConfig)
    worker: WorkerConfig = field(default_factory=WorkerConfig)
    campus: CampusConfig = field(default_factory=CampusConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


_default: Config | None = None


def get_config() -> Config:
    global _default
    if _default is None:
        _default = Config()
    return _default


def set_config(cfg: Config) -> None:
    global _default
    _default = cfg
