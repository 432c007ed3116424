"""Audio/video multimodal stages: FVID container round-trip, real PCM
DSP, frame sampling through a Ray actor pool, codec-magic gating."""

import numpy as np
import pyarrow as pa
import pytest

from mvt_wrangler_ray.sources.media import (
    _audio_pcm,
    _video_frames,
    decode_fvid,
    encode_fvid,
    synth_audio_table,
    synth_videos_table,
    video_geometry,
)
from mvt_wrangler_ray.stages.media import (
    AudioFeatureStage,
    FrameSampleStage,
    sniff_media,
)


def test_fvid_roundtrip():
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (5, 9, 7), dtype=np.uint8)
    blob = encode_fvid(frames, 2400)
    back, fps = decode_fvid(blob)
    assert fps == 2400
    assert np.array_equal(back, frames)
    with pytest.raises(ValueError):
        decode_fvid(b"JUNK" + blob[4:])
    with pytest.raises(ValueError):
        decode_fvid(blob[:-10])


def test_audio_features_match_per_row_dsp():
    t = synth_audio_table(40)
    out = AudioFeatureStage()(t)
    for i in range(40):
        s = np.frombuffer(t["bytes"][i].as_py(), dtype="<i2").astype(np.int64)
        assert out["rms"][i].as_py() == float(np.sqrt((s * s).sum() / len(s)))
        assert out["zcr"][i].as_py() == int(((s[1:] >= 0) != (s[:-1] >= 0)).sum())
        assert out["peak"][i].as_py() == int(np.abs(s).max())
        assert out["duration_s"][i].as_py() == len(s) / 8000


def test_frame_sample_real_pngs():
    from mvt_wrangler_ray.codecs.png import decode_png

    t = synth_videos_table(12)
    out = FrameSampleStage(every=3)(t)
    # every video contributes ceil(n_frames/3) rows
    nf = t["n_frames"].to_numpy(zero_copy_only=False)
    assert len(out) == int(np.ceil(nf / 3).sum())
    # sampled PNGs decode back to the exact source frame
    by_vid = {t["video_id"][i].as_py(): i for i in range(12)}
    for j in range(len(out)):
        i = by_vid[out["video_id"][j].as_py()]
        frames, _ = decode_fvid(t["bytes"][i].as_py())
        f = out["frame_idx"][j].as_py()
        px = decode_png(out["frame_bytes"][j].as_py())
        assert np.array_equal(px, frames[f])
        assert out["frame_mean"][j].as_py() == \
            frames[f].astype(np.int64).sum() / frames[f].size


def test_media_stages_in_ray_actor_pool(ray_session):
    import ray.data as rd

    # override_num_blocks >= concurrency so each pool actor gets an
    # input block (a 1-block side input starves the pool and triggers
    # Ray's "only received 1 input(s)" warning)
    aud = rd.from_arrow(synth_audio_table(300)) \
        .repartition(4).map_batches(
        AudioFeatureStage, batch_format="pyarrow", batch_size=64,
        concurrency=2).to_pandas()
    assert len(aud) == 300 and (aud["peak"] > 0).all()

    vid = rd.from_arrow(synth_videos_table(200)) \
        .repartition(4).map_batches(
        FrameSampleStage, batch_format="pyarrow", batch_size=64,
        concurrency=2,
        fn_constructor_kwargs={"every": 4, "encode_frames": False}).to_pandas()
    nf = synth_videos_table(200)["n_frames"].to_numpy(zero_copy_only=False)
    assert len(vid) == int(np.ceil(nf / 4).sum())


def test_unsupported_codec_magics_raise():
    with pytest.raises(NotImplementedError, match="mp3"):
        AudioFeatureStage()(pa.table({
            "audio_id": pa.array(["a"], pa.string()),
            "bytes": pa.array([b"ID3\x04rest"], pa.binary()),
            "sr": pa.array([8000], pa.int32()),
        }))
    with pytest.raises(NotImplementedError, match="mp4"):
        FrameSampleStage(encode_frames=False)(pa.table({
            "video_id": pa.array(["v"], pa.string()),
            "bytes": pa.array([b"\x00\x00\x00\x18ftypisom"], pa.binary()),
        }))
    assert sniff_media(b"FVID....") is None
    assert sniff_media(b"\x00\x01\x02\x03") is None


def test_synthesis_closed_forms():
    """The synthesized payloads equal their documented closed forms (the
    contract the SQL oracles re-derive)."""
    from mvt_wrangler_ray.geo.geotag import fnv1a64_strings

    t = synth_videos_table(5)
    h64 = fnv1a64_strings(np.array([f"vid{i:08d}" for i in range(5)], dtype=object))
    nf, w, h, fpsx = video_geometry(h64)
    for i in range(5):
        frames, fps100 = decode_fvid(t["bytes"][i].as_py())
        assert fps100 == fpsx[i]
        assert np.array_equal(
            frames, _video_frames(int(h64[i]), int(nf[i]), int(w[i]), int(h[i])))
        s, tl = int(h64[i] | np.uint64(1)) % 256, int(h64[i] >> np.uint64(7)) % 256
        p = np.arange(15 * 15, dtype=np.int64)
        for f in (0, int(nf[i]) - 1):
            expect = ((p + f * 7919) * s + tl) % 256
            assert np.array_equal(frames[f].ravel(), expect.astype(np.uint8))

    a = synth_audio_table(5)
    ah = fnv1a64_strings(np.array([f"aud{i:08d}" for i in range(5)], dtype=object))
    for i in range(5):
        got = np.frombuffer(a["bytes"][i].as_py(), dtype="<i2")
        assert np.array_equal(got, _audio_pcm(int(ah[i]), 4096))
        s16 = int(ah[i] | np.uint64(1)) % 65536
        tl = int(ah[i] >> np.uint64(7))
        tt = np.arange(4096, dtype=np.int64)
        expect = ((tt * s16 + tl) % 65536) - 32768
        assert np.array_equal(got.astype(np.int64), expect)


def test_scene_change_stage_matches_brute_force():
    import pyarrow as pa

    from mvt_wrangler_ray.stages.media import SceneChangeStage

    rng = np.random.default_rng(23)
    frames = rng.integers(0, 256, (6, 4, 4), dtype=np.uint8)
    # force one identical consecutive pair (no boundary there)
    frames[3] = frames[2]
    blob = encode_fvid(frames, 2400)
    batch = pa.table({"video_id": pa.array([9], pa.int64()),
                      "bytes": pa.array([blob], pa.binary())})
    p = frames.reshape(6, -1).astype(np.int64)
    sad = np.abs(p[1:] - p[:-1]).sum(axis=1)
    thr = int(np.median(sad))
    out = SceneChangeStage(min_sad=thr)(batch)
    want_idx = (np.nonzero(sad >= thr)[0] + 1).tolist()
    assert out["frame_idx"].to_pylist() == want_idx
    assert out["sad"].to_pylist() == sad[sad >= thr].tolist()
    assert 3 not in out["frame_idx"].to_pylist()  # identical pair
