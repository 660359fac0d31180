"""TRUE wideband SNR + fade-spread estimation for decoded frames.

Extracted from ModemEngine (round-4 split): pure host-numpy measurement,
no engine state — returns (snr_db, fade_spread_db) and the engine wrapper
stores them in ModemStats.  This is the round-3 improvement over the
reference's negotiation input: the per-carrier/training estimators read
10-30 dB above the wideband channel SNR and collapse under fading
(types.hpp scale; tools/calibrate_snr.py measurements), while
frame-vs-noise-floor power is calibration-free.
"""

from __future__ import annotations

import numpy as np

NOISE_CHUNK = 480  # 10 ms blocks for the min-statistics noise floor


def wideband_snr_db(buf: np.ndarray, start: int, end: int,
                    noise_before: int | None = None,
                    segments: list[tuple[int, int]] | None = None
                    ) -> tuple[float, float]:
    """TRUE wideband SNR for a frame occupying buf[start:end) -> (snr_db,
    fade_spread_db).

    Mean in-frame power against a min-statistics noise floor (lower-quartile
    mean of 10 ms chunk powers over the audio BEFORE the frame, pooled with
    post-frame audio when the pre window is starved, falling back to the
    whole snapshot).  Signal power is the in-frame mean CLIPPED to at most
    0.75 dB above the 25th percentile of 100 ms-SMOOTHED chunk powers — an
    outage-aware SNR: PAPR beating is fast (<50 ms) and averages out, fade
    envelopes are slow (>=250 ms coherence) and survive, so AWGN reads
    nearly unbiased while fading charges the dips as margin.

    ``segments``: extra gap-free active spans (e.g. the two chirps of a
    chirp-led preamble, OTFS codeword bursts) — they join BOTH the active-
    average rescale (chirp-led frames' nominal scale is the all-active
    mean, INV-TEST-001) and the fade-spread pool.

    fade_spread_db: 90/10 percentile ratio of the 100 ms-smoothed chunk
    powers pooled over every active segment, each normalized by its own
    median (a constant-envelope chirp and a multicarrier body sit at
    different RMS).  AWGN ~0-1 dB, Watterson fading ~5-9 dB; -1.0 when
    under ~1 s of pooled active signal (could alias fading as flat).
    """
    start = max(0, start)
    end = min(end, len(buf))
    spread = -1.0
    if noise_before is None:
        noise_before = start
    noise_before = max(0, min(noise_before, start))
    C = NOISE_CHUNK
    if end - start < C:
        return 0.0, spread
    # Noise window: audio before the frame, pooled with the audio AFTER
    # the frame end when the pre window is starved — a Cox false-positive's
    # guarded fail-consume can land the buffer start just samples ahead of
    # a chirp-led frame (observed on the NVIS profile), and the whole-
    # snapshot fallback then measures mostly SIGNAL as the floor.  The
    # lower-quartile statistic keeps a following frame's head in the tail
    # window from inflating the floor, same as for the pre window.
    pre = buf[max(0, noise_before - 24000):noise_before]
    if len(pre) < 4 * C:
        tail = buf[end:end + 24000]
        pooled = np.concatenate([pre, tail]) if len(tail) else pre
        src = pooled if len(pooled) >= 4 * C else buf
    else:
        src = pre
    n = (len(src) // C) * C
    if n == 0:
        return 0.0, spread
    cp = (src[:n].astype(np.float64).reshape(-1, C) ** 2).mean(-1)
    k = max(1, len(cp) // 4)
    pn = max(float(np.sort(cp)[:k].mean()), 1e-12)

    sig = buf[start:end].astype(np.float64)
    ps_raw = float((sig * sig).mean())
    ps = ps_raw
    nsc = (len(sig) // C) * C
    w = 10  # 100 ms smoothing window, in chunks
    if nsc >= 12 * C:
        sp = (sig[:nsc].reshape(-1, C) ** 2).mean(-1)
        smooth = np.convolve(sp, np.full(w, 1.0 / w), mode="valid")
        ps = min(float(sp.mean()),
                 float(np.percentile(smooth, 25.0)) * 10 ** 0.075)
    if segments:
        # Chirp-led frames: rescale the outage-clipped body power by
        # (all-active mean / raw body mean) so the estimate lands on the
        # scale the mode tables were calibrated against (body-only reads
        # ~3 dB low vs the active-average truth).
        tot, cnt = float((sig * sig).sum()), len(sig)
        for s0, s1 in segments:
            seg = buf[max(0, s0):min(s1, len(buf))].astype(np.float64)
            tot += float((seg * seg).sum())
            cnt += len(seg)
        if cnt and ps_raw > 1e-12:
            ps *= (tot / cnt) / ps_raw

    pooled = []
    for s0, s1 in [(start, end)] + list(segments or []):
        seg = buf[max(0, s0):min(s1, len(buf))].astype(np.float64)
        nsc_s = (len(seg) // C) * C
        if nsc_s < 12 * C:
            continue
        sp_s = (seg[:nsc_s].reshape(-1, C) ** 2).mean(-1)
        sm = np.convolve(sp_s, np.full(w, 1.0 / w), mode="valid")
        pooled.append(sm / max(float(np.median(sm)), 1e-12))
    if pooled:
        allsm = np.concatenate(pooled)
        if len(allsm) >= 91:  # >= 1 s contiguous-equivalent
            spread = float(np.clip(10.0 * np.log10(
                np.percentile(allsm, 90.0)
                / max(np.percentile(allsm, 10.0), 1e-12)), 0.0, 40.0))
    snr = max(ps / pn - 1.0, 0.1)
    return float(np.clip(10.0 * np.log10(snr), -10.0, 40.0)), spread
