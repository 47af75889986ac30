"""Viewer throughput evidence (round-5 VERDICT item 7): drive the viewer's
RenderSession HEADLESSLY exactly as the HTTP loop does — start a 1024x1024
cornell path render on the real TPU, sample the live `msegs_per_s` counter
(the number the UI badge shows, ref the reference's pass counter
code.js:1861-1894), and print ONE JSON line to paste into BASELINE.md.

Gate (VERDICT): live viewer segs/s within ~2x of bench.py's headline.

Usage: PYTHONPATH=. python scripts/viewer_evidence.py [seconds]
"""
import json
import sys
import time


def main():
    from raytracing_tpu.viewer import RenderSession

    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    # 16 passes/chunk at 1024^2 — the same steady-state chunk the bench
    # uses; the default 4 keeps the 320x240 UI snappy but pays per-chunk
    # fixed costs 4x more often at this resolution
    s = RenderSession(width=1024, height=1024, bounces=5, chunk_passes=16)
    s.start(scene="cornell", renderer="path", spp=1)
    t0 = time.time()
    samples = []
    try:
        while time.time() - t0 < seconds:
            time.sleep(2.0)
            st = s.status()
            if st["msegs_per_s"] > 0:
                samples.append(st["msegs_per_s"])
    finally:
        s.stop()
    st = s.status()
    # steady state = last half of the samples (first include compile)
    steady = samples[len(samples) // 2:] or [0.0]
    avg = sum(steady) / len(steady)
    print(json.dumps({
        "metric": "viewer_live_msegs_per_s",
        "scene": "cornell 1024x1024 b5 path",
        "samples": [round(x, 1) for x in samples],
        "steady_msegs_per_s": round(avg, 1),
        "passes_done": st["frame"],
    }))


if __name__ == "__main__":
    main()
