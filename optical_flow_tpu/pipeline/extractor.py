"""Corpus motion-magnitude extractor (TPU re-expression of
`optical_flow.py:69-168`).

Behavioral contract (all verified against the reference semantics):
  * ms -> frame conversion truncates: `int(fps*ms/1000)`
    (`optical_flow.py:77-78`);
  * centered windows `(max(0, c-w//2), min(tot-1, c+w//2))` for
    `c in range(0, tot, step)` (`:80`);
  * the first failed frame read aborts all remaining windows (`:89-96`);
  * zero successful windows raises (`:101-102`);
  * per-position aggregation means all window magnitudes with
    `start <= pos < end` (`:107-112`), WARN-logging empty positions;
  * timestamps `int(pos/fps*1000)` of first/last aggregated position
    (`:114-115`);
  * magnitudes scaled by the `top_percentile`-th percentile, clipped to
    [0,1], x100, rounded to 2 decimals (`:120-125` — note the default 5 is
    the 5th/LOW percentile; preserved as-is, SURVEY.md 2a);
  * `.done` sentinel versioning and `force_run == 'True'` string comparison
    (`:149-168`).

TPU-first difference: instead of a per-window Python loop of
seek->decode->flow (the reference's hot loop, SURVEY.md 3.1), unique frame
indices are decoded once, staged to device as one batch, and all window
pairs run through the vmapped Farnebäck pyramid in fixed-size chunks.
"""

from __future__ import annotations

import functools
import os
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from optical_flow_tpu.io.sidecar import (DoneSentinel, ShotProgress,
                                         write_mag_to_csv)
from optical_flow_tpu.io.video import VFRStreamError, VideoReader
from optical_flow_tpu.pipeline.prefetch import DecodePrefetcher, pair_chunk_for
from optical_flow_tpu.models.farneback import calc_flow_batched
from optical_flow_tpu.ops.host import bgr2gray_host, resize_gray_host
from optical_flow_tpu.ops.resize import aspect_preserving_size
from optical_flow_tpu.ops.polar import cart_to_polar
from optical_flow_tpu.utils.config import ExtractorConfig, EXTRACTOR
from optical_flow_tpu.utils.logging import get_logger
from optical_flow_tpu.utils.metrics import PipelineMetrics

logger = get_logger("optical_flow_tpu.extractor")

# Counters of the most recent extract_video run (observability/test hook;
# includes peak_live_frames, the HBM-residency bound).
LAST_RUN_COUNTERS: dict = {}



def _window_schedule(tot_frames: int, fps: float, step_ms: int, window_ms: int):
    step = int(fps * step_ms / 1000)
    win = int(fps * window_ms / 1000)
    if step <= 0:
        # reference crashes with range(0, tot, 0); give a clear error instead
        raise ValueError(
            f"step_size={step_ms}ms is shorter than one frame at fps={fps}")
    windows = [
        (max(0, c - int(win / 2.0)), min(tot_frames - 1, c + int(win / 2.0)))
        for c in range(0, tot_frames, step)
    ]
    return windows, step


@functools.lru_cache(maxsize=1)
def _dp_mesh():
    """A pure-data-parallel mesh over all local devices, or None on a
    single-device host (OFT_DISABLE_MESH=1 forces single-device)."""
    if os.environ.get("OFT_DISABLE_MESH") == "1":
        return None
    import jax
    if jax.local_device_count() <= 1:
        return None
    from optical_flow_tpu.parallel.mesh import make_mesh
    return make_mesh(n_spatial=1)


def _magnitude_sums(prev_batch, next_batch,
                    config: ExtractorConfig):
    """Summed flow magnitude per frame pair — `np.sum(mag)` of
    `calculate_optical_flow` (`optical_flow.py:49-66`), batched on device.

    On a multi-device host (v5e-8 etc.) the batch is sharded over a
    data-parallel mesh — each chip runs the full per-shard pyramid
    including the Pallas kernels (BASELINE config 5); dp sharding is
    numerically exact, so outputs are identical to the one-device path.

    Returns a DEVICE array (B,); callers convert at the end so chunks
    pipeline without a host sync each."""
    mesh = _dp_mesh()
    if mesh is not None:
        from optical_flow_tpu.parallel.mesh import sharded_extract_step
        n = mesh.devices.size
        b = len(prev_batch)
        padded = -(-b // n) * n              # pad to a device multiple by
        if padded != b:                      # replicating the last pair
            reps = [prev_batch[-1]] * (padded - b)
            prev_batch = jnp.concatenate(
                [jnp.asarray(prev_batch), jnp.stack(reps)])
            reps = [next_batch[-1]] * (padded - b)
            next_batch = jnp.concatenate(
                [jnp.asarray(next_batch), jnp.stack(reps)])
        sums = sharded_extract_step(mesh, jnp.asarray(prev_batch),
                                    jnp.asarray(next_batch), config.farneback)
        return sums[:b]
    flow = calc_flow_batched(jnp.asarray(prev_batch), jnp.asarray(next_batch),
                             config.farneback)
    mag, _ = cart_to_polar(flow[..., 0], flow[..., 1])
    return jnp.sum(mag, axis=(-2, -1))


def extract_video(v_path: str, config: ExtractorConfig,
                  progress_ckpt: ShotProgress | None = None
                  ) -> Tuple[List[float], List[int]]:
    """Per-video pipeline: returns ([aggregated mags], [start_ms, end_ms]).

    Mirrors `get_optical_flow` (`optical_flow.py:69-117`).

    progress_ckpt (optional, --resume): windows already recorded in the
    shot-granular checkpoint are not re-decoded or re-computed; newly
    completed chunks are appended to it as their device results land, so
    a killed run redoes only the tail (io/sidecar.py:ShotProgress).
    Results are ordered by window index before aggregation, making a
    resumed run's CSV byte-identical to an uninterrupted one.
    """
    metrics = PipelineMetrics("extract")
    vid = VideoReader(v_path)
    if not vid.is_opened():
        raise IOError(f"Unable to read from video: '{v_path}'")

    tot_frames = vid.frame_count
    fps = vid.fps
    windows, step = _window_schedule(tot_frames, fps, config.step_size,
                                     config.window_size)
    completed = progress_ckpt.load() if progress_ckpt is not None else {}
    mags_by_idx = {i: t for i, t in completed.items() if i < len(windows)
                   and (t[0], t[1]) == windows[i]}
    todo = [(i, w) for i, w in enumerate(windows) if i not in mags_by_idx]

    # streamed decode (parallel segment readers, decode-ahead) of each
    # needed frame exactly once, ascending; stop at first failure
    # (reference early-break semantics: a window is included iff both its
    # frames decode AND no earlier window failed).  Resize + grayscale run
    # host-side inside the decode workers (bit-exact numpy twins of the
    # device ops), so only the small gray frames are uploaded.
    vid.release()
    needed = sorted({f for _, w in todo for f in w})
    if config.frame_width:
        def transform(frame, _w=config.frame_width):
            return resize_gray_host(frame, _w)
    else:
        transform = bgr2gray_host
    prefetch = DecodePrefetcher(v_path, needed, transform=transform)

    frames = {}
    failed_at = None
    win_iter = iter(todo)
    pending = next(win_iter, None)          # (window_index, (start, end))
    chunk: List[Tuple[int, Tuple[int, int]]] = []
    # chunk sizing uses the FLOW resolution (frames are resized to
    # frame_width before flow), not the source resolution
    if config.frame_width:
        fw, fh = aspect_preserving_size(vid.height, vid.width,
                                        config.frame_width)
    else:
        fw, fh = vid.width, vid.height
    chunk_size = pair_chunk_for(max(fh, 1), max(fw, 1))

    pending_sums = []
    validate_sample = []      # first flushed pair, host copies (--validate)

    def drain_one():
        chk, sums = pending_sums.pop(0)
        for (idx, (s, e)), v in zip(chk, np.asarray(sums)):
            mags_by_idx[idx] = (s, e, float(v))
            if progress_ckpt is not None:
                progress_ckpt.record(idx, s, e, float(v))

    def flush(chunk):
        if config.validate and not validate_sample:
            w0 = chunk[0][1]
            validate_sample.append((np.asarray(frames[w0[0]]),
                                    np.asarray(frames[w0[1]])))
        with metrics.stage("flow"):
            prev = jnp.stack([frames[w[0]] for _, w in chunk])
            nxt = jnp.stack([frames[w[1]] for _, w in chunk])
            sums = _magnitude_sums(prev, nxt, config)   # async dispatch
        metrics.add("frame_pairs", len(chunk))
        pending_sums.append((chunk, sums))
        # keep two chunks in flight (pipelining); older results are
        # already complete, so draining them checkpoints incrementally
        # without a stall
        while len(pending_sums) > 2:
            drain_one()

    evict_th = 0
    peak_live = 0
    try:
      with metrics.stage("stream"):
        for pos, frame in prefetch:
            if frame is None:
                failed_at = pos
                break
            frames[pos] = jnp.asarray(frame)   # tiny gray upload, async
            metrics.add("frames_decoded")
            peak_live = max(peak_live, len(frames))
            while pending is not None and pending[1][0] in frames \
                    and pending[1][1] in frames:
                chunk.append(pending)
                pending = next(win_iter, None)
                if len(chunk) >= chunk_size:
                    flush(chunk)
                    chunk = []
            # Evict frames no later window can touch: window starts are
            # monotone in the center (`optical_flow.py:80`), so everything
            # below the earliest still-unflushed start is dead.  Without
            # this, a feature-length full-res video accumulates GBs of HBM.
            th = chunk[0][1][0] if chunk else (
                pending[1][0] if pending is not None else pos + 1)
            if th > evict_th:
                for k in [k for k in frames if k < th]:
                    del frames[k]
                evict_th = th
        # windows not fully decoded before a failure are dropped, exactly
        # like the reference's early break
        if chunk:
            flush(chunk)
        # host sync for the remaining in-flight chunks
        while pending_sums:
            drain_one()
    finally:
        if progress_ckpt is not None:
            progress_ckpt.close()   # flushed records survive a crash

    # window-index order: identical float accumulation order whether the
    # run was fresh or resumed (dispatch order is index order anyway)
    mags = [mags_by_idx[i] for i in sorted(mags_by_idx)]
    if not mags:
        raise Exception(
            "Unable to extract the optical flow, no frames where found.")

    # aggregation (`optical_flow.py:106-112`)
    agg: List[Tuple[int, float]] = []
    for pos in range(0, tot_frames, step):
        vals = [m[2] for m in mags if pos >= m[0] and pos < m[1]]
        if vals:
            agg.append((pos, float(np.mean(vals))))
        else:
            logger.info("WARN: no entry for pos={pos}".format(pos=pos))

    start_ms = int(agg[0][0] / fps * 1000)
    end_ms = int(agg[-1][0] / fps * 1000)
    if validate_sample:
        from optical_flow_tpu.utils.validate import log_validation, sampled_epe
        epe = sampled_epe(*validate_sample[0], config.farneback)
        log_validation(epe, f"extract:{os.path.basename(v_path)}")
        if epe is not None:
            metrics.counters["validate_mean_epe"] = epe
    metrics.counters["peak_live_frames"] = peak_live
    LAST_RUN_COUNTERS.clear()
    LAST_RUN_COUNTERS.update(metrics.counters)
    metrics.log_summary()
    return [a[1] for a in agg], [start_ms, end_ms]


def scale_magnitudes(mag: Sequence[float], top_percentile: int):
    """`scale_magnitudes` (`optical_flow.py:120-125`), numerics preserved."""
    mag = np.asarray(mag)
    scaled = mag / np.percentile(mag, top_percentile)
    scaled = np.clip(scaled, a_min=0, a_max=1) * 100.0
    return list(np.round(scaled, decimals=2))


def _process_one(features_root: str, videoid: str,
                 config: ExtractorConfig) -> bool:
    """One video of the corpus loop: paths, .done gate, extract, CSV.

    Returns True if work ran (or was skipped cleanly); raises on failure.
    """
    features_dir = os.path.join(features_root, videoid, EXTRACTOR)
    v_path = os.path.join(features_root, videoid, "media",
                          videoid + ".mp4")
    if not os.path.isdir(features_dir):
        os.makedirs(features_dir)
    f_path_csv = os.path.join(features_dir, f"{videoid}.csv")
    sentinel = DoneSentinel(features_dir, config.done_version)

    if not sentinel.is_done() or config.force_run == "True":
        ckpt = None
        if config.resume:
            ckpt = ShotProgress(
                os.path.join(features_dir, f"{videoid}.progress"),
                config.done_version)
        aggregated, timestamps = extract_video(v_path, config,
                                               progress_ckpt=ckpt)
        scaled = scale_magnitudes(aggregated, config.top_percentile)
        write_mag_to_csv(f_path_csv, scaled, timestamps)
        sentinel.mark_done()
        if ckpt is not None:
            ckpt.discard()      # .done supersedes the partial checkpoint
    else:
        logger.info("optical flow was already done")
    return True


def run_corpus(features_root: str, videoids: Sequence[str],
               config: ExtractorConfig, progress=None,
               robust: bool = False, video_workers: int = 1) -> list:
    """Corpus driver (`optical_flow.py:135-168`): paths, .done gating, CSV.

    robust=True turns per-video failures into logged skips instead of
    aborting the whole corpus run — required for sharded/elastic corpus
    jobs (SURVEY.md section 5, failure detection); the default matches
    the reference (first failure raises).  Returns the list of failed
    videoids.

    Exception to fail-fast: a VFRStreamError (variable-frame-rate input,
    io/video.py) is ALWAYS a logged per-video skip, robust or not — the
    reference would complete such a corpus (cv2 4.2 processes VFR with
    fps-based indexing), so aborting the run on one VFR file would be a
    new failure mode, while processing it would be silently wrong output.
    Set OFIO_ALLOW_VFR=1 to force cv2-style fps-based indexing instead.

    video_workers > 1 overlaps whole videos in threads.  Measured on a
    local-disk corpus this is NEUTRAL (0.9-1.0x): the per-video
    segment-parallel decode (pipeline/prefetch.py) already saturates the
    host's decode cores.  It exists for corpora where per-video decode is
    latency-bound instead (network storage, sparse-keyframe seeks).
    Output/`.done` semantics are per-video and unaffected; the default 1
    is strictly sequential like the reference.
    """
    logger.info("Computing optical flow for {0} videos".format(len(videoids)))
    failures = []
    if video_workers <= 1:
        iterator = progress(videoids) if progress else videoids
        for videoid in iterator:
            try:
                _process_one(features_root, videoid, config)
            except Exception as e:
                if not robust and not isinstance(e, VFRStreamError):
                    raise
                failures.append(videoid)
                logger.warning(
                    "skipping %s after failure: %s: %s",
                    videoid, type(e).__name__, e)
        return failures

    import concurrent.futures as cf
    with cf.ThreadPoolExecutor(max_workers=video_workers) as pool:
        futs = {pool.submit(_process_one, features_root, v, config): v
                for v in videoids}
        done_iter = cf.as_completed(futs)
        if progress:
            done_iter = progress(done_iter, total=len(futs))
        first_error = None
        for fut in done_iter:
            videoid = futs[fut]
            try:
                fut.result()
            except Exception as e:
                if robust or isinstance(e, VFRStreamError):
                    failures.append(videoid)
                    logger.warning(
                        "skipping %s after failure: %s: %s",
                        videoid, type(e).__name__, e)
                elif first_error is None:
                    first_error = e
                    # fail fast like the sequential path: drop queued
                    # videos (in-flight ones finish; their .done/CSV
                    # outputs stay valid for a later resume)
                    pool.shutdown(wait=False, cancel_futures=True)
                    break
        if first_error is not None:
            raise first_error
    return failures
