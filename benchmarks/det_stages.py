"""Per-stage roofline study of the det_10g detector (VERDICT r4 #2).

The embedder got its stage study in round 2 (52/75/97/99% MXU, stage1's
52% named as the N=64 lane-geometry ceiling).  This gives detect the same
treatment: each section of the det_10g graph — stem, the four backbone
stages, PAFPN neck, the stride-shared head, decode+NMS — is timed in
isolation under the bench's dynamic-n loop-slope method, with

* **GFLOP + MFU** from XLA's unoptimized HLO cost analysis of the exact
  stage fn (benchmarks/flops.py method, computed in-process — this script
  uses a scratch compile cache, so extra lowerings cost nothing);
* **an MXU lane ceiling**: v5e's MXU is a 128x128 systolic array, so a
  conv lowered as an [M, K] x [K, N] contraction (K = Kh*Kw*Cin,
  N = Cout) can keep at most (K/ceil128(K)) * (N/ceil128(N)) of the
  lanes busy once XLA pads both dims to the array.  A FLOP-weighted
  aggregate over the stage's convs approximates the best MFU the stage's
  *shapes* admit, independent of scheduling;
* **an HBM floor**: stage activation+param bytes / 819 GB/s — the
  bandwidth-bound time were compute free.

Verdict each stage by which bound its measured time tracks.  Workload
anchor: the reference's per-frame detect call
(/root/reference/infrenceServer.py:528) at the bench operating point.

Usage: python benchmarks/det_stages.py [B]   (default 96, bf16, 640x640)
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_FLOPS_MODE = "--flops" in sys.argv
if _FLOPS_MODE:
    # CPU-pinned worker: the axon TPU backend returns no cost_analysis
    # for unoptimized lowerings (same reason benchmarks/flops.py runs its
    # worker on CPU).  Must be set before the first jax import below.
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax

# Scratch compile cache (TPU-only; never hijack an active cache dir) —
# same policy as breakdown.py: standalone runs must not write orphan
# entries into the committed .jax_cache.
try:
    if (jax.default_backend() == "tpu"
            and not jax.config.jax_compilation_cache_dir):
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/fre_bench_scratch_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

PEAK_BF16 = 197e12
HBM_GBPS = 819e9  # v5e HBM bandwidth


def _ceil128(n: int) -> int:
    return -(-n // 128) * 128


def conv_ceiling(convs) -> float:
    """FLOP-weighted MXU lane ceiling over [(flops, K, N), ...]."""
    tot = sum(f for f, _, _ in convs)
    if not tot:
        return 1.0
    # time floor per conv = flops / (peak * util); aggregate ceiling is
    # total flops / total floor-time (harmonic, FLOP-weighted)
    floor = sum(f / (min(1.0, k / _ceil128(k)) * min(1.0, n / _ceil128(n)))
                for f, k, n in convs)
    return tot / floor


def stage_flops(fn, *args) -> float:
    ca = jax.jit(fn).lower(*args).cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca["flops"])


def build_stages(batch: int):
    """[(name, fn(i, *args) -> scalar, args, lane_ceiling, bytes)] for the
    det_10g graph at this batch — shared by the TPU timing pass and the
    CPU flops worker."""
    from facerecognition_infrenceengine_tpu.core.config import EngineConfig
    from facerecognition_infrenceengine_tpu.engine import FaceEngine
    from facerecognition_infrenceengine_tpu.models import scrfd
    from facerecognition_infrenceengine_tpu.models.scrfd import (
        CONFIGS, BasicBlockV1e, PAFPN, SCRFDHead)
    from facerecognition_infrenceengine_tpu.models.layers import ConvBN

    cfg = EngineConfig(det_size=(640, 640), max_faces=16,
                       pre_nms_topk=256, dtype="bfloat16")
    e = FaceEngine(cfg, det_arch="det_10g", rec_arch="r50", seed=0)
    sc = CONFIGS["det_10g"]
    dt = jnp.bfloat16
    dv = e.det_variables
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 255, (batch, 640, 640, 3), dtype=np.uint8))

    def sub(coll, keys):
        return {k: coll[k] for k in keys if k in coll}

    def bb_vars(keys):
        return {"params": sub(dv["params"]["backbone"], keys),
                "batch_stats": sub(dv["batch_stats"]["backbone"], keys)}

    # ---- stage modules mirroring the det_10g graph's naming ----
    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = ConvBN(sc.stem_width, 3, 2, act=nn.relu, dtype=dt,
                       name="stem1")(x)
            x = ConvBN(sc.stem_width, 3, 1, act=nn.relu, dtype=dt,
                       name="stem2")(x)
            x = ConvBN(2 * sc.stem_width, 3, 1, act=nn.relu, dtype=dt,
                       name="stem3")(x)
            return nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])

    class Stage(nn.Module):
        idx: int

        @nn.compact
        def __call__(self, x):
            for j in range(sc.stage_blocks[self.idx]):
                stride = 2 if (self.idx > 0 and j == 0) else 1
                x = BasicBlockV1e(sc.stage_planes[self.idx], stride, dtype=dt,
                                  name=f"layer{self.idx + 1}_b{j}")(x)
            return x

    # ---- activations feeding each stage (shapes of the real graph) ----
    def act(h, w, c):
        return jnp.asarray(rng.standard_normal((batch, h, w, c)), dt)

    x_stem_in = frames  # preprocess folded into the stem stage
    x_s1 = act(160, 160, 2 * sc.stem_width)
    x_s2 = act(160, 160, sc.stage_planes[0])
    x_s3 = act(80, 80, sc.stage_planes[1])
    x_s4 = act(40, 40, sc.stage_planes[2])
    feats = [act(80, 80, sc.stage_planes[1]),
             act(40, 40, sc.stage_planes[2]),
             act(20, 20, sc.stage_planes[3])]
    necked = [act(80, 80, sc.neck_width), act(40, 40, sc.neck_width),
              act(20, 20, sc.neck_width)]

    stem_keys = ["stem1", "stem2", "stem3"]
    stage_keys = [[f"layer{i + 1}_b{j}" for j in range(sc.stage_blocks[i])]
                  for i in range(4)]
    neck_vars = {"params": dv["params"]["neck"]}
    head_vars = {"params": dv["params"]["head"],
                 "batch_stats": dv["batch_stats"]["head"]}

    def uniq(x, i):
        if x.dtype == jnp.uint8:
            return jnp.bitwise_xor(x, (i % 251).astype(jnp.uint8))
        return x + (i % 7).astype(dt) * jnp.asarray(1e-3, dt)

    stem_mod, neck_mod = Stem(), PAFPN(sc.neck_width, dtype=dt)
    head_mod = SCRFDHead(sc.head_width, sc.head_depth, dtype=dt)

    def run_stem(i, v, x):
        return jnp.float32(stem_mod.apply(v, scrfd.preprocess(uniq(x, i))
                                          ).sum())

    def run_stage(mod):
        def f(i, v, x):
            return jnp.float32(mod.apply(v, uniq(x, i)).sum())
        return f

    def run_neck(i, v, f0, f1, f2):
        outs = neck_mod.apply(v, [uniq(f0, i), uniq(f1, i), uniq(f2, i)])
        return sum(jnp.float32(o.sum()) for o in outs)

    def run_head(i, v, f0, f1, f2):
        acc = jnp.float32(0.0)
        for f in (f0, f1, f2):
            cls, bbox, kps = head_mod.apply(v, uniq(f, i))
            acc += jnp.float32(cls.sum()) + jnp.float32(bbox.sum()) \
                + jnp.float32(kps.sum())
        return acc

    def run_fwd(i, v, fr):
        logits, bbox, kp = e.detector.apply(v, scrfd.preprocess(uniq(fr, i)))
        return jnp.float32(logits.sum()) + jnp.float32(bbox.sum())

    def run_full(i, v, fr):
        b, s, k, valid = e._detect_impl(v, uniq(fr, i), jnp.float32(0.3))
        return jnp.float32(b.sum()) + s.sum()

    # ---- lane ceilings from the stage's conv shapes ----
    def convs_of_stage(idx):
        out, cin = [], (2 * sc.stem_width if idx == 0
                        else sc.stage_planes[idx - 1])
        hw = {0: 160, 1: 80, 2: 40, 3: 20}[idx]
        p = sc.stage_planes[idx]
        for j in range(sc.stage_blocks[idx]):
            c_in = cin if j == 0 else p
            out.append((2 * batch * hw * hw * 9 * c_in * p, 9 * c_in, p))
            out.append((2 * batch * hw * hw * 9 * p * p, 9 * p, p))
            if j == 0 and (idx > 0 or c_in != p):
                out.append((2 * batch * hw * hw * c_in * p, c_in, p))
        return out

    ceil_stem = conv_ceiling([
        (2 * batch * 320 * 320 * 27 * sc.stem_width, 27, sc.stem_width),
        (2 * batch * 320 * 320 * 9 * sc.stem_width ** 2,
         9 * sc.stem_width, sc.stem_width),
        (2 * batch * 320 * 320 * 9 * sc.stem_width * 2 * sc.stem_width,
         9 * sc.stem_width, 2 * sc.stem_width)])
    w = sc.neck_width
    neck_convs = []
    for hw, cin in ((80, sc.stage_planes[1]), (40, sc.stage_planes[2]),
                    (20, sc.stage_planes[3])):
        neck_convs.append((2 * batch * hw * hw * cin * w, cin, w))  # lateral
    for hw in (80, 40, 20):
        neck_convs.append((2 * batch * hw * hw * 9 * w * w, 9 * w, w))  # fpn
    for hw in (40, 20):  # down (stride-2) + pafpn
        neck_convs.append((2 * batch * hw * hw * 9 * w * w, 9 * w, w))
        neck_convs.append((2 * batch * hw * hw * 9 * w * w, 9 * w, w))
    ceil_neck = conv_ceiling(neck_convs)
    hw_sum = 80 * 80 + 40 * 40 + 20 * 20
    hv = sc.head_width
    head_convs = [(2 * batch * hw_sum * 9 * w * hv, 9 * w, hv),
                  *[(2 * batch * hw_sum * 9 * hv * hv, 9 * hv, hv)] * 3,
                  (2 * batch * hw_sum * 9 * hv * 32, 9 * hv, 32)]
    ceil_head = conv_ceiling(head_convs)

    def bytes_mb(*arrs, params=None):
        b = sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in arrs)
        if params is not None:
            b += sum(x.size * 2 for x in jax.tree.leaves(params))  # bf16
        return b

    stages = [
        ("stem(+pre)", run_stem, (bb_vars(stem_keys), x_stem_in),
         ceil_stem, bytes_mb(x_stem_in, x_s1)),
        ("stage1 s4x56", run_stage(Stage(0)), (bb_vars(stage_keys[0]), x_s1),
         conv_ceiling(convs_of_stage(0)), bytes_mb(x_s1, x_s2)),
        ("stage2 s8x88", run_stage(Stage(1)), (bb_vars(stage_keys[1]), x_s2),
         conv_ceiling(convs_of_stage(1)), bytes_mb(x_s2, x_s3)),
        ("stage3 s16x88", run_stage(Stage(2)), (bb_vars(stage_keys[2]), x_s3),
         conv_ceiling(convs_of_stage(2)), bytes_mb(x_s3, x_s4)),
        ("stage4 s32x224", run_stage(Stage(3)), (bb_vars(stage_keys[3]), x_s4),
         conv_ceiling(convs_of_stage(3)),
         bytes_mb(x_s4, feats[2])),
        ("neck(PAFPN)", run_neck, (neck_vars, *feats),
         ceil_neck, bytes_mb(*feats, *necked, params=neck_vars)),
        ("head x3lvl", run_head, (head_vars, *necked),
         ceil_head, bytes_mb(*necked) * 2),
        ("fwd(whole)", run_fwd, (dv, frames), None, None),
        ("detect+nms", run_full, (dv, frames), None, None),
    ]
    return stages


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    if _FLOPS_MODE:
        out = {}
        for name, fn, args, _ceil, _b in build_stages(batch):
            out[name] = stage_flops(
                lambda *a, _fn=fn: _fn(jnp.int32(1), *a), *args)
        print(json.dumps(out))
        return

    from breakdown import loop_time

    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), str(batch), "--flops"],
        capture_output=True, text=True, timeout=900)
    if r.returncode != 0:
        sys.stderr.write(f"# flops worker failed:\n{r.stderr[-800:]}\n")
        flops_by_stage = {}
    else:
        flops_by_stage = json.loads(r.stdout.strip().splitlines()[-1])

    stages = build_stages(batch)
    print(f"det_10g per-stage roofline  B={batch} bf16 640x640 "
          f"(v5e peak {PEAK_BF16 / 1e12:.0f} TF/s bf16, HBM "
          f"{HBM_GBPS / 1e9:.0f} GB/s)")
    print(f"  {'stage':<16} {'ms':>8} {'GFLOP':>8} {'MFU':>7} "
          f"{'lane-ceil':>9} {'MFU/ceil':>8} {'hbm-floor':>9}")
    tot_ms = 0.0
    for name, fn, args, ceil, nbytes in stages:
        s = loop_time(fn, args)
        fl = flops_by_stage.get(name)
        mfu = fl / s / PEAK_BF16 if fl else None
        hbm_ms = nbytes / HBM_GBPS * 1e3 if nbytes else None
        if name not in ("fwd(whole)", "detect+nms"):
            tot_ms += s * 1e3
        print(f"  {name:<16} {s * 1e3:8.2f} "
              + (f"{fl / 1e9:8.1f} {mfu:6.1%} " if fl else
                 f"{'—':>8} {'—':>6} ")
              + (f"{ceil:8.1%} {mfu / ceil:7.1%} " if ceil and mfu else
                 f"{'—':>9} {'—':>8} ")
              + (f"{hbm_ms:8.2f}m" if hbm_ms else f"{'—':>9}"))
    print(f"  {'sum(stages)':<16} {tot_ms:8.2f}")


if __name__ == "__main__":
    main()
