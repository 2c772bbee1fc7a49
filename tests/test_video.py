"""From-scratch video codecs (functions/video.py): Y4M parse and
MJPEG-AVI container walk, plus the pooled video feature path through
the Arrow mapInPandas operator."""

import numpy as np
import pytest

from didtool_spark.functions.jpeg import encode_gray_blocks_jpeg
from didtool_spark.functions.video import (
    AVI_FIXED_OVERHEAD,
    decode_mjpeg_avi,
    decode_y4m,
    encode_mjpeg_avi,
    encode_y4m,
)
from didtool_spark.operators.multimodal import (
    FEATURE_DIM,
    _video_feature,
    decode_feature,
)


def _mosaic_frames(mid: int, nf: int) -> list[bytes]:
    out = []
    for f in range(nf):
        blocks = (
            (mid * 11 + f * 29 + np.arange(16) * 13) % 256
        ).astype(np.uint8).reshape(4, 4)
        out.append(encode_gray_blocks_jpeg(blocks, pad_to=240))
    return out


class TestY4M:
    def test_round_trip_mono(self):
        frames = (np.arange(3 * 16 * 16) % 256).astype(np.uint8).reshape(3, 16, 16)
        payload = encode_y4m(frames)
        assert payload.startswith(b"YUV4MPEG2 W16 H16 F25:1")
        assert len(payload) == 38 + 3 * 262
        assert np.array_equal(decode_y4m(payload), frames)

    @pytest.mark.parametrize("cs", ["C420", "C420jpeg", "C444"])
    def test_round_trip_chroma(self, cs):
        frames = (np.arange(2 * 8 * 8) % 256).astype(np.uint8).reshape(2, 8, 8)
        assert np.array_equal(decode_y4m(encode_y4m(frames, colorspace=cs)), frames)

    def test_rejects_out_of_subset(self):
        with pytest.raises(ValueError):
            decode_y4m(b"nope")
        frames = np.zeros((1, 4, 4), dtype=np.uint8)
        bad = encode_y4m(frames).replace(b"Cmono", b"C422m")
        with pytest.raises(ValueError):
            decode_y4m(bad)
        with pytest.raises(ValueError):
            decode_y4m(encode_y4m(frames)[:-3])  # truncated frame


class TestMjpegAvi:
    def test_round_trip_exact_blocks(self):
        mid, nf = 17, 4
        payload = encode_mjpeg_avi(_mosaic_frames(mid, nf), 32, 32)
        assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
        assert len(payload) == AVI_FIXED_OVERHEAD + nf * (8 + 240)
        frames = decode_mjpeg_avi(payload)
        assert len(frames) == nf
        for f, fr in enumerate(frames):
            assert fr.shape == (32, 32, 3)
            for b in range(16):
                y, x = (b // 4) * 8, (b % 4) * 8
                v = (mid * 11 + f * 29 + b * 13) % 256
                assert np.all(fr[y:y + 8, x:x + 8] == v)

    def test_odd_frame_length_padded(self):
        # 239-byte frames force the RIFF word-alignment pad byte
        frames = [encode_gray_blocks_jpeg(
            np.full((1, 1), 7, dtype=np.uint8), pad_to=239)] * 2
        payload = encode_mjpeg_avi(frames, 8, 8)
        assert len(payload) == AVI_FIXED_OVERHEAD + 2 * (8 + 240)
        assert len(decode_mjpeg_avi(payload)) == 2

    def test_rejects_non_avi(self):
        with pytest.raises(ValueError):
            decode_mjpeg_avi(b"RIFF\x00\x00\x00\x00WAVE")


class TestVideoFeature:
    def test_sampling_rule(self):
        frames = [np.full((4, 4), v, dtype=np.uint8) for v in range(8)]
        feat, nsamp = _video_feature(frames, 4)
        # step = 8//4 = 2 -> frames 0, 2, 4, 6
        assert nsamp == 4
        assert feat[0] == np.float32((0 + 2 + 4 + 6) * 16 / (4 * 16 * 255))
        _, nsamp3 = _video_feature(frames[:3], 4)
        assert nsamp3 == 3

    def test_decode_feature_dispatch(self):
        frames = np.full((2, 16, 16), 100, dtype=np.uint8)
        feat, nsamp = decode_feature(encode_y4m(frames), "video", 4)
        assert nsamp == 2 and np.allclose(feat, 100 / 255, atol=1e-6)
        payload = encode_mjpeg_avi(_mosaic_frames(3, 2), 32, 32)
        feat2, nsamp2 = decode_feature(payload, "video", 4)
        assert nsamp2 == 2 and len(feat2) == FEATURE_DIM

    def test_unsupported_falls_back_to_stub(self):
        # an AVI whose chunks are not JPEG -> documented stub, not crash
        payload = encode_mjpeg_avi([b"\x00" * 10], 8, 8)
        feat, nsamp = decode_feature(payload, "video", 4)
        assert len(feat) == FEATURE_DIM and nsamp >= 1


def test_media_features_end_to_end(spark):
    """The six-codec generator through the Arrow operator: every kind
    present, video rows carry the sampled-frame count."""
    from didtool_spark.operators.multimodal import (
        extract_media_features, synthetic_media_real)

    out = extract_media_features(synthetic_media_real(spark, n=60)).toPandas()
    assert len(out) == 60
    assert set(out["kind"]) == {"audio", "image", "video"}
    vid = out[out["kind"] == "video"].set_index("media_id")
    for mid, row in vid.iterrows():
        if mid % 6 == 4:
            nf = 2 + mid % 7
            assert row["n_bytes"] == 38 + nf * 262
        else:
            nf = 2 + mid % 5
            assert row["n_bytes"] == 224 + nf * 248
        step = max(1, nf // 4)
        assert row["n_frames_sampled"] == len(range(0, nf, step)[:4])
