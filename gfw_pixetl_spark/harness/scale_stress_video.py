"""Video-modality scale-stress golden run: the multimodal ranged-read
contract at size —

    generate ~100+ MB of real AVI/MJPEG files (executor-side, one
    video per task row) -> RANGED frame sampling (RangedAviReader:
    header + idx1 + base probe + exactly the sampled frame ranges,
    with byte accounting) -> full T.81 JPEG decode of each sampled
    frame -> closed-form pixel verification

Every fact is closed-form: video v's frame k is the DC-exact 16x16
JPEG built from md5("v{v}:{k}") (the q397 construction), so each
sampled frame's block values replay from the digest. The headline
assertion is the READ BUDGET: total bytes read must EQUAL the analytic
sequence (headers + idx1 index + base probe + exactly the sampled
frame ranges) and stay a small fraction of the store — the property
that makes a 2 GB mp4/AVI cost O(index + frames picked) ranged GETs on
a 1000-executor cluster instead of a full-file download.
``tests/test_scale_stress_video.py``
asserts the goldens (marked slow); ``bench.py`` records wall time
(``scale_stress_video`` entry, golden flag).
"""

from __future__ import annotations

import hashlib
import os
import time

_SCALE = int(__import__("os").environ.get("SPARK_GRAFT_STRESS_SCALE", "1"))
N_VIDEOS = 3_000 * _SCALE
FRAMES = 100
SAMPLE_EVERY = 40  # frames 0, 40, 80
N_SAMPLED = 3


def _frame(v: int, k: int) -> bytes:
    from ..functions.multimodal import jpeg_payload

    return jpeg_payload(f"v{v}:{k}")


def _generate(spark, video_dir: str):
    """One real AVI per video id, written executor-side."""
    import pandas as pd

    os.makedirs(video_dir, exist_ok=True)

    def kernel(batches):
        from ..sources.avi import encode_avi

        for pdf in batches:
            paths, sizes = [], []
            for v in pdf["id"]:
                v = int(v)
                frames = [_frame(v, k) for k in range(FRAMES)]
                data = encode_avi(frames, width=16, height=16, fps=30)
                path = os.path.join(video_dir, f"vid-{v:06d}.avi")
                with open(path, "w+b") as f:
                    f.write(data)
                paths.append(path)
                sizes.append(len(data))
            yield pd.DataFrame({"path": paths, "n_bytes": sizes})

    return spark.range(N_VIDEOS).repartition(64).mapInPandas(
        kernel, "path string, n_bytes long")


def _sample_and_decode(spark, gen_df):
    """Ranged sampling + full JPEG decode of the sampled frames. The
    input is (path, n_bytes) — file CONTENT never rides through Spark;
    each task seeks exactly the ranges it needs (object-store shape)."""

    def kernel(batches):
        import pandas as pd

        from ..functions.multimodal import decode_image
        from ..sources.avi import RangedAviReader

        for pdf in batches:
            out = {k: [] for k in ("n_frames", "n_sampled", "n_exact",
                                   "bytes_read", "expected_read",
                                   "n_bytes")}
            for path, n_bytes in zip(pdf["path"], pdf["n_bytes"]):
                v = int(os.path.basename(path)[4:10])
                with open(path, "rb") as f:
                    r = RangedAviReader(f, int(n_bytes))
                    ranges = r.frame_ranges()
                    # closed-form read budget: RIFF head (12) + one
                    # 12-byte chunk probe for hdrl + one for movi (the
                    # JUNK-skipping walk) + idx1 header (8) + the index
                    # itself + the 4-byte base probe + exactly the
                    # sampled frame bytes
                    expected = (12 + 12 + 12 + 8 + 16 * len(ranges) + 4
                                + sum(ranges[s * SAMPLE_EVERY][1]
                                      - ranges[s * SAMPLE_EVERY][0]
                                      for s in range(N_SAMPLED)))
                    n_exact = 0
                    for s in range(N_SAMPLED):
                        k = s * SAMPLE_EVERY
                        img = decode_image(r.read_frame(ranges[k]))
                        d = hashlib.md5(f"v{v}:{k}".encode()).digest()
                        ok = (img.shape[:2] == (16, 16)
                              and int(img[0, 0, 0]) == d[0]
                              and int(img[0, 8, 0]) == d[1]
                              and int(img[8, 0, 0]) == d[2]
                              and int(img[8, 8, 0]) == d[3])
                        n_exact += int(ok)
                    out["n_frames"].append(len(ranges))
                    out["n_sampled"].append(N_SAMPLED)
                    out["n_exact"].append(n_exact)
                    out["bytes_read"].append(r.bytes_read)
                    out["expected_read"].append(expected)
                    out["n_bytes"].append(int(n_bytes))
            yield pd.DataFrame(out)

    return gen_df.select("path", "n_bytes").mapInPandas(
        kernel, "n_frames long, n_sampled long, n_exact long, "
                "bytes_read long, expected_read long, n_bytes long")


def run(spark, work_dir: str) -> dict:
    from pyspark.sql import functions as F

    video_dir = os.path.join(work_dir, "videos")

    t0 = time.perf_counter()
    gen = _generate(spark, video_dir)
    gen = gen.localCheckpoint()  # materialize generation before timing
    n_videos, total_bytes = gen.agg(
        F.count("*"), F.sum("n_bytes")).collect()[0]
    t_gen = time.perf_counter() - t0

    t0 = time.perf_counter()
    agg = _sample_and_decode(spark, gen).agg(
        F.sum("n_frames").alias("n_frames"),
        F.sum("n_sampled").alias("n_sampled"),
        F.sum("n_exact").alias("n_exact"),
        F.sum("bytes_read").alias("bytes_read"),
        F.sum("expected_read").alias("expected_read"),
        F.sum("n_bytes").alias("n_bytes"),
    ).collect()[0]
    t_sample = time.perf_counter() - t0

    return {
        "n_videos": int(n_videos),
        "total_bytes": int(total_bytes),
        "n_frames": int(agg.n_frames),
        "n_sampled": int(agg.n_sampled),
        "n_exact": int(agg.n_exact),
        "bytes_read": int(agg.bytes_read),
        "expected_read": int(agg.expected_read),
        "io_fraction": round(agg.bytes_read / agg.n_bytes, 4),
        "sec_generate": round(t_gen, 3),
        "sec_sample": round(t_sample, 3),
        "sec_full_pipeline": round(t_gen + t_sample, 3),
    }


def verify_outputs(facts: dict) -> list[str]:
    problems: list[str] = []

    def want(key, expected):
        if facts.get(key) != expected:
            problems.append(f"{key}: got {facts.get(key)!r}, "
                            f"want {expected!r}")

    want("n_videos", N_VIDEOS)
    want("n_frames", N_VIDEOS * FRAMES)
    want("n_sampled", N_VIDEOS * N_SAMPLED)
    want("n_exact", N_VIDEOS * N_SAMPLED)  # every pixel probe exact
    if facts["total_bytes"] < 100 << 20:
        problems.append(f"corpus under 100 MB: {facts['total_bytes']}")
    # EXACT read budget: the reader's seek sequence is deterministic
    # (headers + index + base probe + exactly the sampled frames)
    want("bytes_read", facts.get("expected_read"))
    # fixture frames are ~330 B so the 16 B/frame index is a visible
    # fraction; with real-size frames this collapses toward 0
    if facts["io_fraction"] > 0.10:
        problems.append(
            f"ranged sampling read {facts['io_fraction']:.1%} of the "
            "store — the O(index + frames picked) contract is broken")
    return problems
