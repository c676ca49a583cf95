#!/usr/bin/env python3
"""r6: JPEG decode throughput on the fixture corpus (VERDICT #8 evidence).
Pure-Python/numpy timing, no Spark. Prints pixels/s and per-image ms."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from benthos_spark.formats.jpegcodec import decode_jpeg, encode_jpeg


def corpus():
    rng = np.random.default_rng(7)
    imgs = []
    for (h, w) in [(32, 32), (64, 64), (64, 96), (128, 128)]:
        grad = (
            np.add.outer(np.arange(h) * 2, np.arange(w) * 3)[..., None]
            + np.arange(3) * 17
        ) % 256
        imgs.append(grad.astype(np.uint8))
        imgs.append(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))
        stripes = np.zeros((h, w, 3), np.uint8)
        stripes[:, ::2] = 255
        imgs.append(stripes)
    out = []
    for i, img in enumerate(imgs):
        for kw in ({}, {"subsample": True}, {"restart_interval": 4}):
            out.append(encode_jpeg(img, quality=85, **kw))
    return out


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    blobs = corpus()
    # decode once for pixel totals + warm
    tot_px = 0
    for b in blobs:
        w, h, c, px = decode_jpeg(b)
        tot_px += w * h
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for b in blobs:
            decode_jpeg(b)
        best = min(best, time.perf_counter() - t0)
    print(
        f"images={len(blobs)} px={tot_px} best={best:.3f}s "
        f"-> {tot_px/best/1e6:.2f} Mpx/s, {best/len(blobs)*1000:.1f} ms/img"
    )


if __name__ == "__main__":
    main()
