"""TPU validation pass — run this the moment the axon relay is reachable.

One process, sequential stages (the relay allows one python process at a
time), each printing a PASS/FAIL line; the whole run is resumable because
compiled programs land in the persistent cache.

    timeout 1500 python tools/tpu_validate.py [stage ...]

Stages (default: all):
  kernels   compile score_limbs_pallas + pallas_cc on TPU (not interpret),
            assert equality with the XLA paths
  handcompile  time the fused hand program compile at B=64/N=128 with and
            without lax.map chunking (TODO: blowup fix verification)
  fused     time the body program with fused vs unfused peak epilogue
  profile   capture a jax.profiler trace of one bench window -> /tmp/islx_trace
  peaksel   module-span A/B: row-blocked vs flat-rank peak selection
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def stage_kernels():
    from islx.ops import paf as P
    from islx.ops.hand_peaks import find_hand_peaks
    from islx.ops.pallas_paf import score_limbs_pallas

    rng = np.random.RandomState(0)
    h, w = 184, 248
    paf = (rng.rand(h, w, 52).astype(np.float32) - 0.5)
    c, k = 25, 16
    xy = np.stack([rng.randint(0, w, (c, k)), rng.randint(0, h, (c, k))],
                  -1).astype(np.int32)
    valid = rng.rand(c, k) > 0.4
    args = (jnp.asarray(paf), jnp.asarray(xy), jnp.asarray(valid),
            jnp.asarray(P.LIMB_SEQ_BODY25), jnp.asarray(P.MAP_IDX_BODY25))
    t0 = time.time()
    ref = P.score_limbs(*args, 0.05, 10, orig_h=float(h))
    got = score_limbs_pallas(*args, 0.05, 10, orig_h=float(h))
    jax.block_until_ready((ref.score, got.score))
    ok = (np.allclose(np.asarray(ref.score), np.asarray(got.score), atol=1e-4)
          and np.array_equal(np.asarray(ref.ok), np.asarray(got.ok)))
    print(f"[kernels] score_limbs_pallas compiled-on-TPU equality: "
          f"{'PASS' if ok else 'FAIL'} ({time.time() - t0:.1f}s)")

    hm = np.zeros((184, 184, 21), np.float32)
    for ch in range(21):
        cy, cx = rng.randint(20, 160, 2)
        yy, xx = np.mgrid[0:184, 0:184]
        hm[:, :, ch] = rng.uniform(0.5, 1.5) * np.exp(
            -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 4.0 ** 2))
    t0 = time.time()
    a = find_hand_peaks(jnp.asarray(hm), 0.05, use_pallas=False)
    b = find_hand_peaks(jnp.asarray(hm), 0.05, use_pallas=True)
    jax.block_until_ready((a.xy, b.xy))
    ok = np.array_equal(np.asarray(a.xy), np.asarray(b.xy))
    print(f"[kernels] pallas_cc compiled-on-TPU equality: "
          f"{'PASS' if ok else 'FAIL'} ({time.time() - t0:.1f}s)")
    # relative timing (fetch-inclusive, 5 reps each)
    for name, fn in (("xla_cc", lambda: find_hand_peaks(
            jnp.asarray(hm), 0.05, use_pallas=False)),
                     ("pallas_cc", lambda: find_hand_peaks(
                         jnp.asarray(hm), 0.05, use_pallas=True))):
        fn()
        t0 = time.time()
        for _ in range(5):
            np.asarray(fn().xy)
        print(f"[kernels] {name}: {(time.time() - t0) / 5 * 1000:.1f} ms")


def stage_nmspeaks():
    """Compiled-on-TPU equality + interleaved timing of the Pallas NMS+first-K
    peak selection (islx.ops.pallas_peaks) vs the XLA rank/cumsum chain,
    inside the production body program at the bench bucket."""
    from islx.core.config import PoseConfig
    from islx.models import cpm
    from islx.ops.pallas_peaks import nms_first_k
    from islx.ops.peaks import _first_k_masked, _nms_mask
    from islx.pipeline.batch_pose import BatchedBodyPipeline

    rng = np.random.RandomState(0)
    # standalone kernel equality at bench shapes
    b, c, h, w, k = 8, 25, 184, 128, 16
    maps = rng.rand(b, c, h, w).astype(np.float32)
    t0 = time.time()
    got = np.asarray(nms_first_k(jnp.asarray(maps), jnp.float32(0.6), k))
    ok = True
    for i in range(b):
        mask = _nms_mask(jnp.asarray(maps[i].transpose(1, 2, 0)), 0.6)
        want = np.asarray(_first_k_masked(
            mask.transpose(2, 0, 1).reshape(c, h * w), k))
        ok = ok and np.array_equal(want, got[i])
    print(f"[nmspeaks] nms_first_k compiled-on-TPU equality: "
          f"{'PASS' if ok else 'FAIL'} ({time.time() - t0:.1f}s)")

    # interleaved body-program timing, pallas vs xla selection
    B, hb, wb = 64, 184, 128
    params = cpm.init_params("body25")
    frames = (rng.rand(B, hb, wb, 3) * 255).astype(np.uint8)
    pipes = {}
    for name, flag in (("pallas", True), ("xla", False)):
        # pallas_mask=False pins the 'xla' arm to the PURE XLA epilogue —
        # on TPU it would otherwise default to the pallas NMS-mask kernel
        # and the A/B would compare pallas-select vs pallas-mask instead
        pipes[name] = BatchedBodyPipeline(
            params, "body25", PoseConfig(model_type="body25", max_peaks=16),
            compute_dtype=jnp.bfloat16, pallas_nms=flag, pallas_mask=False)
        pipes[name].device_step(frames)  # compile
    for rep in range(3):
        for name, pipe in pipes.items():
            t0 = time.time()
            for i in range(4):
                frames[0, i, rep, 0] ^= 1  # defeat relay memoization
                np.asarray(pipe.device_step(frames))
            print(f"[nmspeaks] rep{rep} {name}: "
                  f"{(time.time() - t0) / 4 * 1000:.0f} ms/64-frame step "
                  f"(fetch-inclusive)")


def stage_handcompile():
    from islx.core.config import HandConfig
    from islx.models import cpm
    from islx.pipeline.batch_pose import BatchedHandPipeline

    B, hb, wb, n = 64, 184, 248, 128
    params = cpm.init_params("hand")
    flat = jnp.zeros((B * hb * wb * 3,), jnp.uint8)
    boxes = jnp.asarray(
        np.stack([np.arange(n) % B, np.full(n, 4), np.full(n, 4),
                  np.full(n, 64)], 1), jnp.int32)
    for chunk in (16, None):
        hand = BatchedHandPipeline(params, HandConfig(scale_search=(1.0,)),
                                   compute_dtype=jnp.bfloat16,
                                   crop_chunk=chunk)
        prog = hand._frames_program(B, hb, wb, n)
        t0 = time.time()
        co = prog.trace(hand.params, flat, boxes).lower().compile()
        tc = time.time() - t0
        t0 = time.time()
        np.asarray(co(hand.params, flat, boxes))
        te = time.time() - t0
        print(f"[handcompile] chunk={chunk}: compile {tc:.1f}s "
              f"exec {te * 1000:.0f} ms")


def stage_fused():
    from islx.core.config import PoseConfig
    from islx.models import cpm
    from islx.pipeline.batch_pose import BatchedBodyPipeline

    B, hb, wb = 32, 184, 248
    params = cpm.init_params("body25")
    frames = (np.random.RandomState(0).rand(B, hb, wb, 3) * 255
              ).astype(np.uint8)
    for fused in (True, False):
        pipe = BatchedBodyPipeline(params, "body25",
                                   PoseConfig(model_type="body25",
                                              max_peaks=16),
                                   compute_dtype=jnp.bfloat16,
                                   fused_peaks=fused)
        pipe.device_step(frames)  # compile
        t0 = time.time()
        for i in range(5):
            frames[0, i, i, 0] ^= 1  # defeat relay memoization
            np.asarray(pipe.device_step(frames))
        print(f"[fused] fused_peaks={fused}: "
              f"{(time.time() - t0) / 5 * 1000:.0f} ms/32-frame step "
              f"(fetch-inclusive)")


def _module_spans_ms(trace_dir):
    """median per-step module span (ms) per distinct XLA module in a trace."""
    from collections import defaultdict

    from tools.trace_summary import parse_xspace

    pbs = []
    for dirpath, _, files in os.walk(trace_dir):
        pbs += [os.path.join(dirpath, f) for f in files
                if f.endswith(".xplane.pb")]
    spans = defaultdict(list)
    for name, lines, meta in parse_xspace(open(max(
            pbs, key=os.path.getmtime), "rb").read()):
        if "TPU" not in name.upper():
            continue
        for mid, dur in lines.get("XLA Modules", []):
            spans[meta.get(mid, f"id{mid}")].append(dur / 1e9)
    return {k: float(np.median(v)) for k, v in spans.items()}


def stage_peaksel():
    """Module-span (relay-immune) A/B of the peak-selection variants inside
    the production body program at bench shapes: row-blocked two-level
    selection (default) vs the flat rank/cumsum chain. ISLX_PEAKS_SELECT is
    read at trace time, and each pipeline instance traces its own program,
    so both variants compile distinct modules in one process."""
    import jax.profiler

    from islx.core.config import PoseConfig
    from islx.models import cpm
    from islx.pipeline.batch_pose import BatchedBodyPipeline

    rng = np.random.RandomState(0)
    B = int(os.environ.get("ISLX_PEAKSEL_B", "192"))
    frames = (rng.rand(B, 184, 128, 3) * 255).astype(np.uint8)
    params = cpm.init_params("body25")
    for mode in ("rows", "flat"):
        os.environ["ISLX_PEAKS_SELECT"] = mode
        pipe = BatchedBodyPipeline(
            params, "body25", PoseConfig(model_type="body25", max_peaks=16),
            compute_dtype=jnp.bfloat16)
        pipe.device_step(frames)  # compile outside the trace
        tdir = f"/tmp/islx_peaksel_{mode}"
        with jax.profiler.trace(tdir):
            for i in range(10):
                frames[0, 0, i, 0] ^= 1   # defeat relay memoization
                np.asarray(pipe.device_step(frames))
        for name, ms in sorted(_module_spans_ms(tdir).items()):
            if "jit" in name:
                print(f"[peaksel] {mode}: {ms:.1f} ms/step "
                      f"(B={B}, module {name[:40]})")
    os.environ.pop("ISLX_PEAKS_SELECT", None)


def stage_pafchunk():
    """Module-span A/B of PAF limb sequencing (ISLX_PAF_CHUNK = vmapped
    limbs per lax.map step) inside the production body program."""
    import jax.profiler

    from islx.core.config import PoseConfig
    from islx.models import cpm
    from islx.pipeline.batch_pose import BatchedBodyPipeline

    rng = np.random.RandomState(0)
    B = int(os.environ.get("ISLX_PEAKSEL_B", "192"))
    frames = (rng.rand(B, 184, 128, 3) * 255).astype(np.uint8)
    params = cpm.init_params("body25")
    for chunk in ("1", "4", "8"):
        os.environ["ISLX_PAF_CHUNK"] = chunk
        pipe = BatchedBodyPipeline(
            params, "body25", PoseConfig(model_type="body25", max_peaks=16),
            compute_dtype=jnp.bfloat16)
        pipe.device_step(frames)  # compile outside the trace
        tdir = f"/tmp/islx_pafchunk_{chunk}"
        with jax.profiler.trace(tdir):
            for i in range(10):
                frames[0, 0, i, 0] ^= 1
                np.asarray(pipe.device_step(frames))
        for name, ms in sorted(_module_spans_ms(tdir).items()):
            if "jit" in name:
                print(f"[pafchunk] chunk={chunk}: {ms:.1f} ms/step "
                      f"(B={B}, module {name[:40]})")
    os.environ.pop("ISLX_PAF_CHUNK", None)


def stage_pafmode():
    """Module-span A/B of PAF scoring formulations inside the production
    body program: materialization-free fused reduce / small-table take vs
    per-cell count matrix (cell) vs one-hot matmul (mxu). Equality is
    pinned in tests/test_batch_pipeline.py."""
    import jax.profiler

    from islx.core.config import PoseConfig
    from islx.models import cpm
    from islx.pipeline.batch_pose import BatchedBodyPipeline

    rng = np.random.RandomState(0)
    B = int(os.environ.get("ISLX_PEAKSEL_B", "192"))
    frames = (rng.rand(B, 184, 128, 3) * 255).astype(np.uint8)
    params = cpm.init_params("body25")
    modes = os.environ.get("ISLX_PAF_MODES", "fused,take,cell").split(",")
    for mode in modes:
        pipe = BatchedBodyPipeline(
            params, "body25", PoseConfig(model_type="body25", max_peaks=16),
            compute_dtype=jnp.bfloat16, paf_mode=mode)
        pipe.device_step(frames)  # compile outside the trace
        tdir = f"/tmp/islx_pafmode_{mode}"
        with jax.profiler.trace(tdir):
            for i in range(10):
                frames[0, 0, i, 0] ^= 1
                np.asarray(pipe.device_step(frames))
        for name, ms in sorted(_module_spans_ms(tdir).items()):
            if "jit_program" in name:
                print(f"[pafmode] {mode}: {ms:.1f} ms/step "
                      f"(B={B}, module {name[:40]})")


def stage_nmsmask():
    """Compiled-on-TPU equality + module-span A/B of the Pallas mask-only
    NMS epilogue (ISLX_PALLAS_MASK / pallas_mask=True) vs the XLA chain,
    inside the production body program at bench shapes. Also packs A/B:
    pack_mode nook (default) vs flat via ISLX_PACK_MODE."""
    import jax.profiler

    from islx.core.config import PoseConfig
    from islx.models import cpm
    from islx.pipeline.batch_pose import BatchedBodyPipeline

    rng = np.random.RandomState(0)
    B = int(os.environ.get("ISLX_PEAKSEL_B", "192"))
    frames = (rng.rand(B, 184, 128, 3) * 255).astype(np.uint8)
    params = cpm.init_params("body25")
    variants = [("xla", dict(pallas_mask=False)),
                ("pmask", dict(pallas_mask=True))]
    frames0 = frames.copy()     # equality inputs (trace loops mutate frames)
    results = {}
    for name, kw in variants:
        pipe = BatchedBodyPipeline(
            params, "body25", PoseConfig(model_type="body25", max_peaks=16),
            compute_dtype=jnp.bfloat16, **kw)
        packed = pipe.device_step(frames0)
        results[name] = pipe.assemble(packed, B)
        tdir = f"/tmp/islx_nmsmask_{name}"
        with jax.profiler.trace(tdir):
            for i in range(10):
                frames[0, 0, i, 0] ^= 1
                np.asarray(pipe.device_step(frames))
        for mname, ms in sorted(_module_spans_ms(tdir).items()):
            if "jit_program" in mname:
                print(f"[nmsmask] {name}: {ms:.1f} ms/step "
                      f"(B={B}, module {mname[:40]})")
    ok = all(
        np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])
        for a, b in zip(results["xla"], results["pmask"]))
    print(f"[nmsmask] assembled (candidate, subset) equality across {B} "
          f"frames: {'PASS' if ok else 'FAIL'}")


def stage_fusedspan():
    """Module-span profile of the CURRENT production FUSED program (body +
    on-device hand boxes + hand CPM) at bench shapes — the relay-immune
    on-device fps/chip figure. Uses the int8 pytrees from .bench_cache when
    present (the bench headline config), else bf16. Trace persists at
    /tmp/islx_fusedspan for `python tools/trace_summary.py /tmp/islx_fusedspan
    --ops` op-category analysis."""
    import cv2
    import jax.profiler

    from islx.core import checkpoint as ckpt
    from islx.models import cpm
    from islx.ops import yuv
    from islx.pipeline.batch_pose import FusedPosePipeline, bucket_for

    B = int(os.environ.get("ISLX_FUSED_B", "192"))
    img = cv2.imread("/root/reference/images/demo.jpg")
    if img is None:
        img = (np.random.RandomState(0).rand(512, 384, 3) * 255
               ).astype(np.uint8)
    h0, w0 = img.shape[:2]
    hb, wb = bucket_for(h0, w0, target_h=184)
    frame = cv2.resize(img, (wb, hb), interpolation=cv2.INTER_CUBIC)
    frames = np.broadcast_to(frame, (B, hb, wb, 3)).copy()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    configs = {"bf16": (cpm.init_params("body25"), cpm.init_params("hand"))}
    for name in os.listdir(os.path.join(repo, ".bench_cache")) \
            if os.path.isdir(os.path.join(repo, ".bench_cache")) else []:
        if name.startswith(f"int8_{hb}x{wb}") and name.endswith("_body"):
            base = os.path.join(repo, ".bench_cache", name[:-5])
            if ckpt.exists(base + "_body") and ckpt.exists(base + "_hand"):
                configs["int8"] = (ckpt.load_pytree(base + "_body"),
                                   ckpt.load_pytree(base + "_hand"))
                break
    which = os.environ.get("ISLX_FUSED_CONFIG",
                           "int8" if "int8" in configs else "bf16")
    bp, hp = configs[which]
    pipe = FusedPosePipeline(bp, hp, compute_dtype=jnp.bfloat16)
    frames_yuv = yuv.bgr_to_yuv420_host(frames)

    def step(i):
        frames_yuv[(i * 131) % (B * hb * wb)] ^= 1
        return pipe.device_step_flat(jnp.asarray(frames_yuv), B, hb, wb,
                                     (h0, w0), 0.4, input_format="yuv420")

    np.asarray(step(0))   # compile + warm outside the trace
    tdir = "/tmp/islx_fusedspan"
    with jax.profiler.trace(tdir):
        for i in range(1, 11):
            np.asarray(step(i))
    for mname, ms in sorted(_module_spans_ms(tdir).items()):
        if "jit" in mname:
            print(f"[fusedspan] {which}: {ms:.1f} ms/step = "
                  f"{B / ms * 1000:.0f} fps/chip on-device "
                  f"(B={B} {hb}x{wb}, module {mname[:40]})")


def stage_handpack():
    """Module-span A/B of hand conv1-block lane packing (VERDICT r3 #1).

    conv1_1 (3->64) and conv1_2 (64->64) fill only 64 of the MXU's 128
    lanes. Packing the two per-frame hand crops channel-wise halves the
    batch and doubles the output-channel tile to 128 lanes:

      base   x[N,S,S,3]   -> conv 3->64  -> relu -> conv 64->64  -> relu
      group  x[N/2,S,S,6] -> conv fg=2 ->128 -> relu -> conv fg=2 ->128
      dense  x[N/2,S,S,6] -> conv 6->128 (block-diag zeros) -> relu ->
                              conv 128->128 (block-diag) -> relu

    group/dense compute EXACTLY base's reductions (dense adds +0.0 terms,
    exact in the f32 accumulator), so outputs are bit-identical — this is a
    pure layout experiment. If either wins, it is a drop-in for the hand
    trunk's first block."""
    import jax.profiler

    S = int(os.environ.get("ISLX_HANDPACK_S", "184"))
    N = int(os.environ.get("ISLX_HANDPACK_N", "384"))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(N, S, S, 3).astype(np.float32))
    w1 = jnp.asarray(rng.randn(3, 3, 3, 64).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.05)
    dn = jax.lax.conv_dimension_numbers(
        (1, S, S, 1), (3, 3, 1, 1), ("NHWC", "HWIO", "NHWC"))

    def conv(v, w, fg=1):
        return jax.lax.conv_general_dilated(
            v, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
            feature_group_count=fg, preferred_element_type=jnp.float32)

    # packed weights: group g of the output reads input channels of crop g
    w1g = jnp.concatenate([w1, w1], -1)                     # [3,3,3,128] fg=2
    w2g = jnp.concatenate([w2, w2], -1)                     # [3,3,64,128]
    z13 = jnp.zeros_like(w1)
    w1d = jnp.concatenate([jnp.concatenate([w1, z13], -1),
                           jnp.concatenate([z13, w1], -1)], 2)  # [3,3,6,128]
    z64 = jnp.zeros_like(w2)
    w2d = jnp.concatenate([jnp.concatenate([w2, z64], -1),
                           jnp.concatenate([z64, w2], -1)], 2)  # [3,3,128,128]

    def mk(cd):
        @jax.jit
        def base(x):
            h = jax.nn.relu(conv(x.astype(cd), w1.astype(cd)))
            return jax.nn.relu(conv(h.astype(cd), w2.astype(cd)))

        @jax.jit
        def group(xp):
            h = jax.nn.relu(conv(xp.astype(cd), w1g.astype(cd), fg=2))
            return jax.nn.relu(conv(h.astype(cd), w2g.astype(cd), fg=2))

        @jax.jit
        def dense(xp):
            h = jax.nn.relu(conv(xp.astype(cd), w1d.astype(cd)))
            return jax.nn.relu(conv(h.astype(cd), w2d.astype(cd)))

        return base, group, dense

    xp = jnp.concatenate([x[0::2], x[1::2]], -1)            # [N/2,S,S,6]

    # numerics check in f32 on a small slice (proves the layout math; the
    # production spans run bf16, where the inter-conv bf16 cast of an
    # f32-order-divergent intermediate can flip a ulp — not a layout error)
    ne = 8
    base32, group32, dense32 = mk(jnp.float32)
    yb = np.asarray(base32(x[:ne]))
    for name, fn in (("group", group32), ("dense", dense32)):
        yp = np.asarray(fn(xp[:ne // 2]))
        un = np.stack([yp[..., :64], yp[..., 64:]], 1).reshape(yb.shape)
        # same reductions, but XLA may tile/accumulate in a different order
        # per module — exact is the expectation, tiny f32-order drift is OK
        d = float(np.abs(un - yb).max())
        scale = float(np.abs(yb).max()) or 1.0
        print(f"[handpack] {name} vs base (f32): max|diff|={d:.2e} "
              f"({'bit-exact' if d == 0 else 'f32-order'}) "
              f"{'PASS' if d <= 1e-5 * scale else 'FAIL'}")

    base, group, dense = mk(jnp.bfloat16)

    for name, fn, arg in (("base", base, x), ("group", group, xp),
                          ("dense", dense, xp)):
        np.asarray(fn(arg))    # warm
        tdir = f"/tmp/islx_handpack_{name}"
        with jax.profiler.trace(tdir):
            for _ in range(6):
                np.asarray(fn(arg))
        spans = [(m, ms) for m, ms in _module_spans_ms(tdir).items()
                 if "jit" in m]
        for mname, ms in spans:
            print(f"[handpack] {name}: {ms:.2f} ms/step "
                  f"(N={N} S={S}, module {mname[:30]})")


def stage_trimspan():
    """Module-span capability of the ACCURACY-GATED FLOP cuts (VERDICT r3
    #1): the fused int8 program with hand CPM stages 6/5/4
    (HandConfig.stages — each trimmed stage is ~2.3 GFLOP per 184px crop)
    and with 160px hand crops (scale 160/368). These are capability
    measurements for BENCH_NOTES/PARITY — the production defaults stay
    reference-exact until tools/validate_checkpoints.py flips a gate on a
    real checkpoint."""
    import cv2
    import jax.profiler

    from islx.core import checkpoint as ckpt
    from islx.core.config import HandConfig
    from islx.models import cpm
    from islx.ops import yuv
    from islx.pipeline.batch_pose import FusedPosePipeline, bucket_for

    B = int(os.environ.get("ISLX_FUSED_B", "192"))
    img = cv2.imread("/root/reference/images/demo.jpg")
    if img is None:
        img = (np.random.RandomState(0).rand(512, 384, 3) * 255
               ).astype(np.uint8)
    h0, w0 = img.shape[:2]
    hb, wb = bucket_for(h0, w0, target_h=184)
    frame = cv2.resize(img, (wb, hb), interpolation=cv2.INTER_CUBIC)
    frames = np.broadcast_to(frame, (B, hb, wb, 3)).copy()
    frames_yuv = yuv.bgr_to_yuv420_host(frames)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bp, hp = cpm.init_params("body25"), cpm.init_params("hand")
    cdir = os.path.join(repo, ".bench_cache")
    for name in (os.listdir(cdir) if os.path.isdir(cdir) else []):
        if name.startswith(f"int8_{hb}x{wb}") and name.endswith("_body"):
            base = os.path.join(cdir, name[:-5])
            if ckpt.exists(base + "_body") and ckpt.exists(base + "_hand"):
                bp = ckpt.load_pytree(base + "_body")
                hp = ckpt.load_pytree(base + "_hand")
                print("[trimspan] int8 pytrees from .bench_cache")
                break

    variants = {
        "s6_184": HandConfig(scale_search=(0.5,), stages=6),   # production
        "s5_184": HandConfig(scale_search=(0.5,), stages=5),
        "s4_184": HandConfig(scale_search=(0.5,), stages=4),
        "s6_160": HandConfig(scale_search=(160 / 368,), stages=6),
        "s5_160": HandConfig(scale_search=(160 / 368,), stages=5),
    }
    for vname, hcfg in variants.items():
        pipe = FusedPosePipeline(bp, hp, hand_cfg=hcfg,
                                 compute_dtype=jnp.bfloat16)

        def step(i):
            frames_yuv[(i * 131) % (B * hb * wb)] ^= 1
            return pipe.device_step_flat(jnp.asarray(frames_yuv), B, hb, wb,
                                         (h0, w0), 0.4, input_format="yuv420")

        np.asarray(step(0))   # compile + warm outside the trace
        tdir = f"/tmp/islx_trimspan_{vname}"
        with jax.profiler.trace(tdir):
            for i in range(1, 7):
                np.asarray(step(i))
        for mname, ms in sorted(_module_spans_ms(tdir).items()):
            if "jit" in mname:
                print(f"[trimspan] {vname}: {ms:.1f} ms/step = "
                      f"{B / ms * 1000:.0f} fps/chip on-device (B={B})")


def stage_stem():
    """Module-span A/B of VGG-stem formulations at bench shapes.

    The B=192 body-program profile shows the stem pathological: the
    normalize producer materializes bf16[192,184,128,3] C-minor (3 lanes of
    128 used -> ~1.2GB physical) and conv1_1 reads it (reshape 3.4ms +
    conv1_1 7.7ms + conv1_2 3.0ms per step vs ~2.3ms ideal). Variants:

      nhwc  current: normalize -> conv1_1 -> conv1_2 -> pool (NHWC)
      nchw  stem in NCHW (W=128 -> exact lane tile), transpose back after
            the pool (145MB at [B,64,92,64])
      s2d   exact 2x2 space-to-depth rewrite of conv1_1: [B,92,64,12] input,
            3x3x12->256 kernel with rearranged weights, depth-to-space back
    """
    import jax.profiler

    rng = np.random.RandomState(0)
    B, H, W = (int(os.environ.get("ISLX_STEM_B", "192")), 184, 128)
    frames = (rng.rand(B * H * W * 3) * 255).astype(np.uint8)
    w1 = (rng.rand(3, 3, 3, 64).astype(np.float32) - 0.5) * 0.2
    b1 = rng.rand(64).astype(np.float32) * 0.1
    w2 = (rng.rand(3, 3, 64, 64).astype(np.float32) - 0.5) * 0.05
    b2 = rng.rand(64).astype(np.float32) * 0.1
    cd = jnp.bfloat16

    def conv(x, w, dn, pad=1):
        return jax.lax.conv_general_dilated(
            x.astype(cd), jnp.asarray(w, cd), (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=dn, preferred_element_type=jnp.float32)

    def relu_b(out, b):
        return jnp.maximum(out.astype(cd) + jnp.asarray(b, cd), 0)

    def f_nhwc(flat):
        x = flat.reshape(B, H, W, 3).astype(jnp.float32) / 256.0 - 0.5
        h = relu_b(conv(x, w1, ("NHWC", "HWIO", "NHWC")), b1)
        h = relu_b(conv(h, w2, ("NHWC", "HWIO", "NHWC")), b2)
        h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                  (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        return h

    def f_nchw(flat):
        x = flat.reshape(B, H, W, 3).astype(jnp.float32) / 256.0 - 0.5
        x = x.transpose(0, 3, 1, 2)
        h = conv(x, w1, ("NCHW", "HWIO", "NCHW"))
        h = jnp.maximum(h.astype(cd)
                        + jnp.asarray(b1, cd)[None, :, None, None], 0)
        h = conv(h, w2, ("NCHW", "HWIO", "NCHW"))
        h = jnp.maximum(h.astype(cd)
                        + jnp.asarray(b2, cd)[None, :, None, None], 0)
        h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                  (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
        return h.transpose(0, 2, 3, 1)

    # exact s2d weight rearrangement: w2s[Dy,Dx,(py,px,c),(qy,qx,o)] =
    # w1[2Dy+py-qy-1, 2Dx+px-qx-1, c, o] where in range, else 0
    w1s = np.zeros((3, 3, 12, 256), np.float32)
    for Dy in range(3):
        for Dx in range(3):
            for py in range(2):
                for px in range(2):
                    for qy in range(2):
                        for qx in range(2):
                            dy, dx = 2 * Dy + py - qy - 1, 2 * Dx + px - qx - 1
                            if 0 <= dy < 3 and 0 <= dx < 3:
                                w1s[Dy, Dx, (py * 2 + px) * 3:(py * 2 + px) * 3 + 3,
                                    (qy * 2 + qx) * 64:(qy * 2 + qx + 1) * 64] = \
                                    w1[dy, dx, :, :]

    def f_s2d(flat):
        x = flat.reshape(B, H // 2, 2, W // 2, 2, 3).astype(jnp.float32)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 12)
        x = x / 256.0 - 0.5
        h = conv(x, w1s, ("NHWC", "HWIO", "NHWC"))     # [B,92,64,256]
        h = relu_b(h, np.tile(b1, 4))                  # epilogue in s2d space
        h = h.reshape(B, H // 2, W // 2, 2, 2, 64)
        h = h.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, 64)
        h = relu_b(conv(h, w2, ("NHWC", "HWIO", "NHWC")), b2)
        h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                  (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        return h

    fns = {"nhwc": f_nhwc, "nchw": f_nchw, "s2d": f_s2d}
    flat = jnp.asarray(frames)
    ref = None
    for name, fn in fns.items():
        jf = jax.jit(fn)
        out = np.asarray(jf(flat), np.float32)
        if ref is None:
            ref = out
        else:
            d = np.abs(out - ref).max()
            print(f"[stem] {name} max|diff| vs nhwc: {d:.5f} "
                  f"({'PASS' if d < 0.05 else 'FAIL'})")
        tdir = f"/tmp/islx_stem_{name}"
        with jax.profiler.trace(tdir):
            for i in range(10):
                frames[i] ^= 1
                flat = jnp.asarray(frames)
                np.asarray(jf(flat))
        for mname, ms in sorted(_module_spans_ms(tdir).items()):
            if "jit" in mname:
                print(f"[stem] {name}: {ms:.2f} ms/step (B={B})")


def stage_packab():
    """TPU equality + interleaved fetch-inclusive e2e A/B of result-buffer
    packings on the FUSED program: 'nook' (f32) vs 'bits' (s32 bit-packed,
    ~62% of the bytes). The fetch leg rides the same degraded link as the
    uploads, so result bytes are throughput — module spans can't see this,
    only fetch-inclusive wall-clock can."""
    import cv2

    from islx.core import checkpoint as ckpt
    from islx.models import cpm
    from islx.ops import yuv
    from islx.pipeline.batch_pose import FusedPosePipeline, bucket_for

    B = int(os.environ.get("ISLX_FUSED_B", "192"))
    img = cv2.imread("/root/reference/images/demo.jpg")
    if img is None:
        img = (np.random.RandomState(0).rand(512, 384, 3) * 255
               ).astype(np.uint8)
    h0, w0 = img.shape[:2]
    hb, wb = bucket_for(h0, w0, target_h=184)
    frame = cv2.resize(img, (wb, hb), interpolation=cv2.INTER_CUBIC)
    frames = np.broadcast_to(frame, (B, hb, wb, 3)).copy()
    frames_yuv = yuv.bgr_to_yuv420_host(frames)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bp, hp = cpm.init_params("body25"), cpm.init_params("hand")
    cdir = os.path.join(repo, ".bench_cache")
    for name in (os.listdir(cdir) if os.path.isdir(cdir) else []):
        if name.startswith(f"int8_{hb}x{wb}") and name.endswith("_body"):
            base = os.path.join(cdir, name[:-5])
            if ckpt.exists(base + "_body") and ckpt.exists(base + "_hand"):
                bp = ckpt.load_pytree(base + "_body")
                hp = ckpt.load_pytree(base + "_hand")
                print("[packab] int8 pytrees from .bench_cache")
                break

    modes = os.environ.get("ISLX_PACKAB_MODES", "nook,bits,bits16"
                           ).split(",")
    pipes, results, planes = {}, {}, {}
    for mode in modes:
        os.environ["ISLX_PACK_MODE"] = mode
        pipes[mode] = FusedPosePipeline(bp, hp, compute_dtype=jnp.bfloat16)
        packed = pipes[mode].device_step_flat(
            jnp.asarray(frames_yuv), B, hb, wb, (h0, w0), 0.4,
            input_format="yuv420")
        body, boxes, peaks = pipes[mode].unpack(np.asarray(packed), B)
        planes[mode] = (pipes[mode].body.unpack(body, B), boxes, peaks)
        if mode in ("nook", "bits"):
            results[mode] = pipes[mode].assemble(packed, B)
        print(f"[packab] {mode} packed words/frame: {packed.size // B} "
              f"({packed.dtype})")
    os.environ.pop("ISLX_PACK_MODE", None)

    if "nook" in results and "bits" in results:
        (ra, xa, pa), (rb, xb, pb) = results["nook"], results["bits"]
        ok = (np.array_equal(xa, xb) and np.array_equal(pa, pb)
              and all(np.array_equal(c1, c2) and np.array_equal(s1, s2)
                      for (c1, s1), (c2, s2) in zip(ra, rb)))
        print(f"[packab] nook/bits assembled equality across {B} frames: "
              f"{'PASS' if ok else 'FAIL'}")
    if "bits" in planes and "bits16" in planes:
        (pl_a, box_a, pk_a) = planes["bits"]
        (pl_b, box_b, pk_b) = planes["bits16"]
        ok = np.array_equal(box_a, box_b) and np.array_equal(pk_a, pk_b)
        for a, bpl in zip(pl_a, pl_b):
            if a.dtype.kind == "f":
                ok = ok and np.allclose(bpl, a, rtol=1e-3, atol=1e-3)
            else:
                ok = ok and np.array_equal(a, bpl)
        print(f"[packab] bits16 vs bits planes (ints exact, scores ~f16): "
              f"{'PASS' if ok else 'FAIL'}")

    counter = [0]

    def run(pipe, n):
        t0 = time.time()
        for _ in range(n):
            i = counter[0]
            counter[0] += 1
            frames_yuv[(i * 131) % (B * hb * wb)] ^= 1
            packed = pipe.device_step_flat(
                jnp.asarray(frames_yuv), B, hb, wb, (h0, w0), 0.4,
                input_format="yuv420")
            np.asarray(packed)
        return (time.time() - t0) / n * 1000

    for rep in range(4):
        for mode, pipe in pipes.items():
            ms = run(pipe, 4)
            print(f"[packab] rep{rep} {mode}: {ms:.0f} ms/step "
                  f"= {B / ms * 1000:.0f} fps (fetch-inclusive)")


def stage_depthab():
    """Interleaved fetch-inclusive A/B of the bench dispatch pipeline's
    in-flight window depth (2/3/4) and split uploads (1/2 legs) on the fused
    int8 B=192 program (VERDICT r3 #5). Cross-process bench runs can't
    resolve these deltas (ambient relay drift ~2x); only same-process
    interleaving can."""
    import itertools
    from collections import deque

    import cv2

    from islx.core import checkpoint as ckpt
    from islx.models import cpm
    from islx.ops import yuv
    from islx.pipeline.batch_pose import FusedPosePipeline, bucket_for

    B = int(os.environ.get("ISLX_FUSED_B", "192"))
    img = cv2.imread("/root/reference/images/demo.jpg")
    if img is None:
        img = (np.random.RandomState(0).rand(512, 384, 3) * 255
               ).astype(np.uint8)
    h0, w0 = img.shape[:2]
    hb, wb = bucket_for(h0, w0, target_h=184)
    frame = cv2.resize(img, (wb, hb), interpolation=cv2.INTER_CUBIC)
    frames = np.broadcast_to(frame, (B, hb, wb, 3)).copy()
    frames_yuv = yuv.bgr_to_yuv420_host(frames)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bp, hp = cpm.init_params("body25"), cpm.init_params("hand")
    cdir = os.path.join(repo, ".bench_cache")
    for name in (os.listdir(cdir) if os.path.isdir(cdir) else []):
        if name.startswith(f"int8_{hb}x{wb}") and name.endswith("_body"):
            base = os.path.join(cdir, name[:-5])
            if ckpt.exists(base + "_body") and ckpt.exists(base + "_hand"):
                bp = ckpt.load_pytree(base + "_body")
                hp = ckpt.load_pytree(base + "_hand")
                print("[depthab] int8 pytrees from .bench_cache")
                break
    pipe = FusedPosePipeline(bp, hp, compute_dtype=jnp.bfloat16)

    counter = [0]

    def dispatch(split):
        i = counter[0]
        counter[0] += 1
        frames_yuv[(i * 131) % (B * hb * wb)] ^= 1
        if split <= 1:
            flat = jnp.asarray(frames_yuv)
        else:
            n = frames_yuv.shape[0]
            cut = [n * j // split for j in range(split + 1)]
            flat = jnp.concatenate([jnp.asarray(frames_yuv[cut[j]:cut[j + 1]])
                                    for j in range(split)])
        return pipe.device_step_flat(flat, B, hb, wb, (h0, w0), 0.4,
                                     input_format="yuv420")

    def window(depth, split, n_iters=4):
        q = deque()
        t0 = time.time()
        for _ in range(n_iters):
            q.append(dispatch(split))
            if len(q) > depth:
                np.asarray(q.popleft())
        while q:
            np.asarray(q.popleft())
        return B * n_iters / (time.time() - t0)

    variants = [(2, 1), (3, 1), (4, 1), (2, 2), (3, 2)]
    window(2, 1, 2)   # warm
    fps = {v: [] for v in variants}
    for rep in range(4):
        for v in variants:
            fps[v].append(window(*v))
            print(f"[depthab] rep{rep} depth={v[0]} split={v[1]}: "
                  f"{fps[v][-1]:.0f} fps (fetch-inclusive)")
    for v in variants:
        med = float(np.median(fps[v]))
        print(f"[depthab] MEDIAN depth={v[0]} split={v[1]}: {med:.0f} fps")
    best = max(variants, key=lambda v: np.median(fps[v]))
    print(f"[depthab] BEST: depth={best[0]} split={best[1]} — set "
          "ISLX_BENCH_DEPTH/ISLX_BENCH_SPLIT accordingly")


def _aot_fixture():
    """Deterministic (pipe, frames, orig_hw) shared by aotsave/aotload —
    the two stages run in SEPARATE processes (one TPU process at a time),
    so everything they compare must rebuild identically from seeds."""
    import cv2

    from islx.models import cpm
    from islx.pipeline.batch_pose import FusedPosePipeline, bucket_for

    B, (h0, w0) = 8, (512, 384)
    hb, wb = bucket_for(h0, w0, target_h=184)
    img = (np.random.RandomState(0).rand(h0, w0, 3) * 255).astype(np.uint8)
    frame = cv2.resize(img, (wb, hb), interpolation=cv2.INTER_CUBIC)
    frames = np.broadcast_to(frame, (B, hb, wb, 3)).copy()
    pipe = FusedPosePipeline(cpm.init_params("body25"),
                             cpm.init_params("hand"))
    return pipe, frames, (h0, w0), B, hb, wb


def stage_aotsave():
    """Export the fused program as a serialized-executable artifact +
    reference results; run stage `aotload` in a FRESH process next."""
    from islx.core import aot

    pipe, frames, hw0, B, hb, wb = _aot_fixture()
    t0 = time.time()
    packed = np.asarray(pipe.device_step(frames, hw0, thre1=0.05))
    t_compile = time.time() - t0
    os.makedirs("/tmp/islx_aot", exist_ok=True)
    t0 = time.time()
    meta = aot.save_fused(pipe, "/tmp/islx_aot/fused.islxprog",
                          B, hb, wb, hw0, kind="exe")
    np.savez("/tmp/islx_aot/ref.npz", packed=packed)
    print(f"[aotsave] exported kind=exe platform={meta['platform']} "
          f"export={time.time() - t0:.1f}s "
          f"(in-process compile+first-step was {t_compile:.1f}s)")


def stage_aotload():
    """Fresh-process load of the stage-`aotsave` artifact: time-to-first-
    result vs the cold compile, and bit-equality of the packed buffer."""
    from islx.core import aot

    pipe, frames, hw0, B, hb, wb = _aot_fixture()
    ref = np.load("/tmp/islx_aot/ref.npz")["packed"]
    t0 = time.time()
    key = aot.load_fused(pipe, "/tmp/islx_aot/fused.islxprog")
    t_load = time.time() - t0
    t0 = time.time()
    packed = np.asarray(pipe.device_step(frames, hw0, thre1=0.05))
    t_first = time.time() - t0
    ok = np.array_equal(ref, packed)
    print(f"[aotload] {'PASS' if ok else 'FAIL'} key={key} "
          f"load={t_load:.1f}s first-step={t_first:.1f}s "
          f"(vs 20-40s cold compile); bit-equal={ok}")


def stage_profile():
    os.environ["BENCH_PROFILE"] = "/tmp/islx_trace"
    os.environ.setdefault("BENCH_WATCHDOG_S", "1200")
    sys.argv = ["bench.py"]
    import importlib

    bench = importlib.import_module("bench")
    bench._watchdog()


STAGES = {"kernels": stage_kernels, "nmspeaks": stage_nmspeaks,
          "handcompile": stage_handcompile,
          "fused": stage_fused, "profile": stage_profile,
          "peaksel": stage_peaksel, "pafchunk": stage_pafchunk,
          "pafmode": stage_pafmode, "stem": stage_stem,
          "trimspan": stage_trimspan, "handpack": stage_handpack,
          "nmsmask": stage_nmsmask, "fusedspan": stage_fusedspan,
          "packab": stage_packab, "depthab": stage_depthab,
          "aotsave": stage_aotsave, "aotload": stage_aotload}

if __name__ == "__main__":
    names = sys.argv[1:] or ["kernels", "handcompile", "fused"]
    # patient-probe protocol (bench.py's): a wedged relay must not hang the
    # in-process backend init — probe in a subprocess first, with the
    # one-silence-window recovery cycle. ISLX_NO_PROBE=1 skips.
    if not os.environ.get("ISLX_NO_PROBE"):
        import bench as _bench

        if not _bench._tpu_alive():
            print("TPU unreachable after patient probe; aborting")
            sys.exit(1)
    print("devices:", jax.devices())
    for name in names:
        try:
            STAGES[name]()
        except Exception as e:  # keep later stages running
            print(f"[{name}] ERROR: {type(e).__name__}: {e}")
