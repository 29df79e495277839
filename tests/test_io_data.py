import numpy as np
import pytest

from recombiner_tpu.config import AUDIO, CIFAR, PROTEIN, TINY, VIDEO
from recombiner_tpu.data.pipeline import points_from_datum, to_numpy_channel_last
from recombiner_tpu.data.protein import normalize_backbone, parse_pdb_ca
from recombiner_tpu.io.bitstream import (
    pack_bitstream,
    read_bitstream,
    unpack_bitstream,
    write_bitstream,
)


def test_bitstream_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    indices = {
        "w": rng.integers(0, 2**16, size=(4, 10)).astype(np.int64),
        "h": rng.integers(0, 2**16, size=(2, 3)).astype(np.int64),
    }
    path = str(tmp_path / "s.rctb")
    n = write_bitstream(
        path, indices, config_name="kodak", codebook_seed=42, bits_per_group=16
    )
    assert n > 0
    header, out = read_bitstream(path)
    assert header["config"] == "kodak"
    assert header["codebook_seed"] == 42
    np.testing.assert_array_equal(out["w"], indices["w"])
    np.testing.assert_array_equal(out["h"], indices["h"])


def test_bitstream_crc_detects_corruption():
    blob = bytearray(
        pack_bitstream(
            {"w": np.zeros((2, 2), np.int64)},
            config_name="cifar", codebook_seed=1, bits_per_group=16,
        )
    )
    blob[-8] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        unpack_bitstream(bytes(blob))


def test_bitstream_rejects_out_of_range():
    with pytest.raises(ValueError, match="range"):
        pack_bitstream(
            {"w": np.full((1, 1), 2**16)},
            config_name="cifar", codebook_seed=1, bits_per_group=16,
        )


def test_bitstream_size_is_compact():
    # 500 rows x 128 groups x 16 bits = 128000 bytes payload
    idx = np.zeros((500, 128), np.int64)
    blob = pack_bitstream(idx_dict := {"w": idx}, config_name="cifar",
                          codebook_seed=1, bits_per_group=16)
    assert len(blob) < 500 * 128 * 2 + 400  # payload + small header


def test_points_from_datum_shapes():
    img = np.random.default_rng(0).uniform(size=(32, 32, 3)).astype(np.float32)
    X, Y = points_from_datum(img, CIFAR)
    assert X.shape == (1, 1024, 16)
    assert Y.shape == (1, 1024, 3)
    aud = np.random.default_rng(0).uniform(size=(48000, 1)).astype(np.float32)
    X, Y = points_from_datum(aud, AUDIO)
    assert X.shape == (60, 800, 16)
    assert Y.shape == (60, 800, 1)
    vid = np.random.default_rng(0).uniform(size=(24, 128, 128, 3)).astype(np.float32)
    X, Y = points_from_datum(vid, VIDEO)
    assert X.shape == (64, 384 * 16, 18)
    prot = np.random.default_rng(0).normal(size=(96, 3)).astype(np.float32)
    X, Y = points_from_datum(prot, PROTEIN)
    assert X.shape == (1, 96, 16)


def test_to_numpy_channel_last_torch():
    torch = __import__("torch")
    t = torch.arange(24).reshape(2, 3, 4).float()  # (C=2, 3, 4)
    arr = to_numpy_channel_last(t)
    assert arr.shape == (3, 4, 2)
    np.testing.assert_array_equal(arr[..., 0], t[0].numpy())


def test_parse_pdb_ca(tmp_path):
    lines = []
    for i in range(100):
        x, y, z = 1.0 * i, 2.0 * i, 3.0 * i
        lines.append(
            f"ATOM  {i + 1:5d}  CA  ALA A{i + 1:4d}    {x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00           C"
        )
        lines.append(
            f"ATOM  {i + 1:5d}  N   ALA A{i + 1:4d}    {x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00           N"
        )
    p = tmp_path / "test.pdb"
    p.write_text("\n".join(lines))
    xyz = parse_pdb_ca(str(p))
    assert xyz.shape == (96, 3)
    np.testing.assert_allclose(xyz[5], [5.0, 10.0, 15.0])
    norm = normalize_backbone(xyz)
    np.testing.assert_allclose(norm.mean(0), 0.0, atol=1e-6)

    short = tmp_path / "short.pdb"
    short.write_text("\n".join(lines[:100]))  # only 50 CA atoms
    assert parse_pdb_ca(str(short)) is None


def test_image_loader_landscape_rotation(tmp_path):
    from PIL import Image

    from recombiner_tpu.data.image import read_image

    arr = (np.random.default_rng(1).uniform(size=(48, 32, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "portrait.png")
    Image.fromarray(arr).save(p)
    img = read_image(p)
    assert img.shape == (32, 48, 3)  # rotated to landscape
    assert img.max() <= 1.0


def test_synthetic_dataset_patch_consistency():
    from recombiner_tpu.config import TINY_PATCH
    from recombiner_tpu.data.synthetic import synthetic_dataset

    X, Y = synthetic_dataset(TINY_PATCH, 3, seed=0)
    assert X.shape == (12, 256, 16)
    assert Y.shape == (12, 256, 3)
    assert 0.0 <= Y.min() and Y.max() <= 1.0


def test_synthetic_speech_kind():
    from recombiner_tpu.config import AUDIO, TINY
    from recombiner_tpu.data.synthetic import speech_like_clip, synthetic_dataset

    X, Y = synthetic_dataset(AUDIO, 1, seed=0, kind="speech")
    assert X.shape == (60, 800, 16) and Y.shape == (60, 800, 1)
    assert 0.0 <= Y.min() and Y.max() <= 1.0

    # speech-like clips must carry real high-frequency energy (>1 kHz), the
    # thing the smooth generator lacks at 16 kHz
    rng = np.random.default_rng(0)
    clip = speech_like_clip(rng, 48000)[:, 0]
    spec = np.abs(np.fft.rfft(clip - clip.mean())) ** 2
    freqs = np.fft.rfftfreq(48000, 1 / 16000)
    hi = spec[freqs > 1000].sum() / spec.sum()
    assert hi > 0.05, f"high-frequency energy fraction {hi}"

    # patch-scale (800-sample) waveform shape must sit near real speech:
    # the reference clip measures median kurtosis 3.49 / crest 3.24 over
    # active patches; the glottal-pulse-coherent generator is tuned to match
    # (random-phase harmonics gave ~2.4 kurtosis, pure pulse trains ~8)
    kurts, crests = [], []
    for s in range(6):
        c = speech_like_clip(np.random.default_rng(s), 48000)[:, 0] * 2.0 - 1.0
        c = c - c.mean()
        P = c[: 48000 // 800 * 800].reshape(-1, 800)
        act = P[P.std(1) > 0.3 * c.std()]
        kurts.append(np.median(
            ((act - act.mean(1, keepdims=True)) ** 4).mean(1) / act.var(1) ** 2
        ))
        crests.append(np.median(np.abs(act).max(1) / act.std(1)))
    assert 2.5 < np.median(kurts) < 5.5, f"patch kurtosis {np.median(kurts)}"
    assert 2.5 < np.median(crests) < 4.5, f"patch crest {np.median(crests)}"

    with pytest.raises(ValueError, match="speech"):
        synthetic_dataset(TINY, 1, kind="speech")  # 2-D geometry


def test_load_wav_clip(tmp_path):
    from recombiner_tpu.config import TINY_AUDIO
    from recombiner_tpu.data.audio import load_wav_clip
    from recombiner_tpu.data.export import write_wav

    rng = np.random.default_rng(2)
    clip01 = rng.uniform(0.2, 0.8, 256).astype(np.float32)  # [0,1] domain
    p = str(tmp_path / "clip.wav")
    write_wav(p, clip01)  # writes 16-bit PCM of 2*clip-1

    X, Y = load_wav_clip(p, TINY_AUDIO)
    assert X.shape == (4, 64, 16) and Y.shape == (4, 64, 1)
    # round trip: PCM16 quantization error only
    np.testing.assert_allclose(Y.reshape(-1), clip01, atol=1.0 / 32767)

    with pytest.raises(ValueError, match="samples"):
        short = str(tmp_path / "short.wav")
        write_wav(short, clip01[:100])
        load_wav_clip(short, TINY_AUDIO)


def test_synthetic_backbone_kind():
    from recombiner_tpu.config import PROTEIN, TINY
    from recombiner_tpu.data.synthetic import protein_backbone, synthetic_dataset

    X, Y = synthetic_dataset(PROTEIN, 2, seed=0, kind="backbone")
    assert X.shape == (2, 96, 16) and Y.shape == (2, 96, 3)

    xyz = protein_backbone(np.random.default_rng(0), 96) * 25.0  # de-normalize
    d = np.linalg.norm(np.diff(xyz, axis=0), axis=1)
    np.testing.assert_allclose(d, 3.8, atol=1e-4)  # CA-CA virtual bonds
    np.testing.assert_allclose(xyz.mean(0), 0.0, atol=1e-4)  # centered

    with pytest.raises(ValueError, match="backbone"):
        synthetic_dataset(TINY, 1, kind="backbone")


def test_process_audio_datasets_full_path(tmp_path):
    """The COMPLETE offline audio preprocessor (selection rng, per-clip
    normalization/truncation, short-clip rejection, npz dumps) driven by a
    fake in-memory corpus — the real LibriSpeech download cannot run here
    (zero egress), but everything downstream of decode now does."""
    from recombiner_tpu.data.audio import (
        CLIP_SAMPLES,
        load_audio,
        load_clip_list,
        process_audio_datasets,
    )

    rng = np.random.default_rng(0)

    def corpus_fn(url):
        # test-clean: 3 clips (one too short -> dropped); train: 5 clips
        n = 3 if url == "test-clean" else 5
        clips = [
            rng.uniform(-1, 1, CLIP_SAMPLES + 100).astype(np.float32)
            for _ in range(n)
        ]
        if url == "test-clean":
            clips[1] = clips[1][: CLIP_SAMPLES // 2]  # too short
        return clips

    process_audio_datasets(str(tmp_path), corpus_fn=corpus_fn)

    test_clips = load_clip_list(str(tmp_path / "test_dataset.npz"))
    train_clips = load_clip_list(str(tmp_path / "train_dataset.npz"))
    assert len(test_clips) == 2  # short clip rejected
    assert len(train_clips) == 5
    for c in test_clips + train_clips:
        assert c.shape == (CLIP_SAMPLES,)
        assert c.min() >= 0.0 and c.max() <= 1.0  # (wav+1)/2 domain

    # and the training loader consumes the dump end-to-end
    X, Y = load_audio(train_clips[:2], AUDIO)
    assert X.shape[0] == 2 * AUDIO.patches_per_datapoint
    assert Y.shape == (X.shape[0], AUDIO.n_pixels, 1)


def test_process_video_datasets_full_path(tmp_path):
    """The COMPLETE offline video preprocessor (24-frame truncation, center
    crop 240, resize 128, /255, small-frame rejection, npz dumps) driven by
    a fake decoder — no video codecs exist in this environment."""
    from recombiner_tpu.data.video import (
        N_FRAMES,
        SIZE,
        load_clip_list,
        load_video,
        process_video_datasets,
    )

    rng = np.random.default_rng(1)
    fake = {
        "a.avi": rng.integers(0, 256, (30, 250, 320, 3), dtype=np.uint8),
        "b.avi": rng.integers(0, 256, (24, 240, 240, 3), dtype=np.uint8),
        "small.avi": rng.integers(0, 256, (24, 100, 100, 3), dtype=np.uint8),
    }
    process_video_datasets(
        ["a.avi", "small.avi"], ["b.avi"], str(tmp_path), decode_fn=lambda p: fake[p]
    )

    train = load_clip_list(str(tmp_path / "train_dataset.npz"))
    test = load_clip_list(str(tmp_path / "test_dataset.npz"))
    assert len(train) == 1  # small frame rejected
    assert len(test) == 1
    for c in train + test:
        assert c.shape == (N_FRAMES, SIZE, SIZE, 3)
        assert c.min() >= 0.0 and c.max() <= 1.0

    # constant-color frames survive crop+resize exactly (interpolation of a
    # constant is the constant): pins the value chain, not just shapes
    const = np.full((26, 260, 260, 3), 128, np.uint8)
    from recombiner_tpu.data.video import preprocess_clip

    out = preprocess_clip(const)
    np.testing.assert_allclose(out, 128.0 / 255.0, rtol=1e-6)

    X, Y = load_video(test, VIDEO)
    assert X.shape[0] == VIDEO.patches_per_datapoint
    assert Y.shape == (X.shape[0], VIDEO.n_pixels, 3)


def test_bitstream_rejects_malformed_inputs():
    """Reader contract (docs/FORMAT.md §2): every malformed input raises
    ValueError — never a struct/numpy internal error or silent garbage."""
    import numpy as np
    import pytest

    good = pack_bitstream(
        {"w": np.arange(6, dtype=np.int64).reshape(2, 3)},
        config_name="tiny", codebook_seed=42, bits_per_group=16,
    )
    for blob in (
        b"",                      # empty
        b"NOPE" + good[4:],       # wrong magic
        good[:5],                 # truncated mid-header-length
        good[: len(good) // 2],   # truncated mid-payload
        good[:-4] + b"\x00\x00\x00\x00",  # corrupted CRC
        good[:-1],                # truncated CRC
    ):
        with pytest.raises(ValueError):
            unpack_bitstream(blob)


def test_bitstream_rejects_future_version():
    import numpy as np
    import pytest
    import struct
    import zlib

    good = pack_bitstream(
        {"w": np.zeros((1, 2), np.int64)},
        config_name="tiny", codebook_seed=42, bits_per_group=16,
    )
    body = bytearray(good[:-4])
    body[4] = 99  # future version byte
    blob = bytes(body) + struct.pack("<I", zlib.crc32(bytes(body)))
    with pytest.raises(ValueError, match="version"):
        unpack_bitstream(blob)
