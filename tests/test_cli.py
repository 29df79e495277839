"""CLI end-to-end: train -> compress -> decompress on a tiny image dataset."""

import os

import numpy as np
import pytest
from PIL import Image

from recombiner_tpu.config import TINY


@pytest.fixture(scope="module")
def image_dirs(tmp_path_factory):
    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("data")
    train = root / "train"
    test = root / "test"
    train.mkdir()
    test.mkdir()
    for d, n in ((train, 3), (test, 2)):
        for i in range(n):
            arr = (rng.uniform(size=(16, 16, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(str(d / f"img_{i}.png"))
    return str(train), str(test), str(root / "out")


def test_cli_train_compress_decompress(image_dirs):
    from recombiner_tpu.cli import compress, decompress, train

    train_dir, test_dir, out_dir = image_dirs
    os.makedirs(out_dir, exist_ok=True)

    train.main(
        [
            "--train_dir", train_dir, "--dataset", "tiny", "--max_bitrate", "6.0",
            "--saving_dir", out_dir, "--n_em_iters", "2", "--first_epochs", "10",
            "--later_epochs", "5", "--lr", "2e-3",
        ]
    )
    priors = [f for f in os.listdir(out_dir) if f.startswith("PRIOR_")]
    assert len(priors) == 1
    prior_path = os.path.join(out_dir, priors[0])

    result = compress.main(
        [
            "--test_dir", test_dir, "--test_idx", "0", "--prior_path", prior_path,
            "--save_dir", out_dir, "--n_epochs", "20", "--lr", "2e-3",
            "--sample_size", "2", "--finetune_epochs", "2",
        ]
    )
    assert os.path.exists(os.path.join(out_dir, "Distortion_test_id_0.csv"))
    assert os.path.exists(os.path.join(out_dir, "GroupIndex_test_id_0.csv"))
    bs_path = os.path.join(out_dir, "bitstream_test_id_0.rctb")
    assert os.path.exists(bs_path)

    y = decompress.main(
        ["--bitstream", bs_path, "--prior_path", prior_path, "--save_dir", out_dir]
    )
    # the standalone decoder reproduces the encoder's reported reconstruction
    np.testing.assert_array_equal(y, result.reconstruction)
    decoded = [f for f in os.listdir(out_dir) if f.endswith("_decoded.npy")]
    assert decoded


def test_cli_compress_rejects_wrong_dataset(image_dirs):
    from recombiner_tpu.cli import compress

    train_dir, test_dir, out_dir = image_dirs
    priors = [f for f in os.listdir(out_dir) if f.startswith("PRIOR_")]
    prior_path = os.path.join(out_dir, priors[0])
    with pytest.raises(SystemExit, match="does not match"):
        compress.main(
            [
                "--test_dir", test_dir, "--test_idx", "0", "--dataset", "cifar",
                "--prior_path", prior_path, "--save_dir", out_dir,
            ]
        )


def test_rd_sweep_synthetic(tmp_path):
    from recombiner_tpu.cli import rd_sweep

    out = str(tmp_path / "rd.json")
    points = rd_sweep.main(
        [
            "--dataset", "tiny", "--synthetic", "2", "--bitrates", "2.0", "6.0",
            "--n_em_iters", "2", "--first_epochs", "10", "--later_epochs", "5",
            "--n_encode_epochs", "15", "--finetune_epochs", "1",
            "--sample_size", "2", "--lr", "2e-3", "--out", out,
        ]
    )
    assert len(points) == 2
    # higher bitrate target => more groups => higher actual bitrate
    assert points[1]["actual_bitrate"] >= points[0]["actual_bitrate"]
    import json

    saved = json.load(open(out))
    assert saved["dataset"] == "tiny"
    assert len(saved["points"]) == 2


@pytest.mark.slow
def test_rd_sweep_real_wav(tmp_path):
    """rd_sweep with --test_wav: speech-like synthetic prior, real-WAV encode
    target, media export (the workflow behind docs/RD_AUDIO.md)."""
    from recombiner_tpu.cli import rd_sweep
    from recombiner_tpu.data.export import write_wav
    from recombiner_tpu.data.synthetic import speech_like_clip

    clip = speech_like_clip(np.random.default_rng(5), 256)[:, 0]
    wav_path = str(tmp_path / "gt.wav")
    write_wav(wav_path, clip)

    out = str(tmp_path / "rd.json")
    export = str(tmp_path / "media")
    points = rd_sweep.main(
        [
            "--dataset", "tiny_audio", "--synthetic", "2",
            "--synthetic_kind", "speech", "--test_wav", wav_path,
            "--bitrates", "40.0", "--n_em_iters", "2", "--first_epochs", "8",
            "--later_epochs", "4", "--n_encode_epochs", "10",
            "--finetune_epochs", "1", "--sample_size", "2", "--lr", "2e-3",
            "--out", out, "--export_dir", export,
        ]
    )
    assert len(points) == 1
    exported = points[0]["exported"]
    assert len(exported) == 1 and exported[0].endswith(".wav")
    assert os.path.exists(exported[0])


def test_rd_sweep_prior_save_load(tmp_path):
    """--save_prior_dir then --load_prior_dir reproduces the identical RD
    point without retraining (the train-once/encode-many study workflow)."""
    from recombiner_tpu.cli import rd_sweep

    common = [
        "--dataset", "tiny", "--synthetic", "2", "--bitrates", "4.0",
        "--n_em_iters", "2", "--first_epochs", "8", "--later_epochs", "4",
        "--n_encode_epochs", "10", "--finetune_epochs", "1",
        "--sample_size", "2", "--lr", "2e-3",
    ]
    pdir = str(tmp_path / "priors")
    p1 = rd_sweep.main(common + ["--out", str(tmp_path / "a.json"),
                                 "--save_prior_dir", pdir])
    assert os.path.exists(os.path.join(pdir, "PRIOR_rd_tiny_bitrate=4.npz"))
    p2 = rd_sweep.main(common + ["--out", str(tmp_path / "b.json"),
                                 "--load_prior_dir", pdir])
    assert p1[0]["actual_bitrate"] == p2[0]["actual_bitrate"]
    assert abs(p1[0]["distortion_mean"] - p2[0]["distortion_mean"]) < 1e-4


def test_compress_remat_flag_tristate():
    from recombiner_tpu.cli.compress import parse_args

    base = ["--test_dir", "x", "--prior_path", "y", "--test_idx", "0",
            "--save_dir", "z"]
    assert parse_args(base).remat is None          # auto
    assert parse_args(base + ["--remat"]).remat is True
    assert parse_args(base + ["--no-remat"]).remat is False


def test_rd_sweep_state_dir_resume(tmp_path):
    """--state_dir writes encode snapshots; a rerun resumes from them and
    still produces the full index set."""
    from recombiner_tpu.cli import rd_sweep

    sdir = str(tmp_path / "st")
    pdir = str(tmp_path / "pr")
    common = [
        "--dataset", "tiny", "--synthetic", "2", "--bitrates", "5.0",
        "--n_em_iters", "1", "--first_epochs", "6", "--later_epochs", "3",
        "--n_encode_epochs", "8", "--finetune_epochs", "1",
        "--sample_size", "2", "--lr", "2e-3", "--state_dir", sdir,
    ]
    p1 = rd_sweep.main(common + ["--out", str(tmp_path / "a.json"),
                                 "--save_prior_dir", pdir])
    snaps = os.listdir(sdir)
    assert any(s.startswith("encode_state_tiny") for s in snaps)
    # rerun with the saved prior: resumes from the (fully coded) snapshot,
    # skips phase-1, and reports the same rate
    p2 = rd_sweep.main(common + ["--out", str(tmp_path / "b.json"),
                                 "--load_prior_dir", pdir])
    assert p2[0]["actual_bitrate"] == p1[0]["actual_bitrate"]
    assert p2[0]["timings"]["optimize_s"] < p1[0]["timings"]["optimize_s"]


def test_adaptive_schedule_preset_resolution():
    """--schedule adaptive fills unset knobs from ADAPTIVE_PRESET; explicit
    flags always win; 'reference' keeps the fixed budgets
    (main_compression.py:148-158)."""
    from recombiner_tpu.cli import compress

    base = ["--test_dir", "d", "--test_idx", "0", "--prior_path", "p.npz",
            "--save_dir", "s"]

    # reference schedule: fixed 30k phase 1, no stops, no fusion
    ref = compress.resolve_schedule(compress.parse_args(base))
    assert ref == (30000, None, None, None, None, None, None, None)

    # adaptive preset: every knob filled from ADAPTIVE_PRESET
    ad = compress.resolve_schedule(
        compress.parse_args(base + ["--schedule", "adaptive"]))
    P = compress.ADAPTIVE_PRESET
    assert ad == (P["n_epochs"], P["p1_lr"], P["p1_samples"], P["p1_stop"],
                  P["ft_stop"], P["fused_steps"], None, None)
    # the measured round-4 operating point (docs/SCHEDULE.md) — a change
    # here is a deliberate re-tune, not drift
    assert ad[0] == 15000 and ad[2] == 3 and ad[5] == 8
    assert ad[1] == (6e-4, 2e-5)

    # explicit flags beat the preset
    ov = compress.resolve_schedule(compress.parse_args(
        base + ["--schedule", "adaptive", "--n_epochs", "7000",
                "--p1_samples", "5", "--fused_steps", "1"]))
    assert ov[0] == 7000 and ov[2] == 5 and ov[5] == 1
    assert ov[1] == P["p1_lr"]  # untouched knobs still from the preset


def test_rd_sweep_schedule_preset_matches_compress():
    """rd_sweep resolves its --schedule knobs through cli/compress's ONE
    preset definition; explicit rd_sweep flags override preset fields."""
    from recombiner_tpu.cli import compress, rd_sweep

    base = ["--dataset", "cifar", "--bitrates", "2"]
    ref = rd_sweep.resolve_schedule_args(rd_sweep.parse_args(base))
    assert ref == (30000, None, None, None, None, None, None, None)

    ad = rd_sweep.resolve_schedule_args(
        rd_sweep.parse_args(base + ["--schedule", "adaptive"]))
    P = compress.ADAPTIVE_PRESET
    assert ad == (P["n_epochs"], P["p1_lr"], P["p1_samples"],
                  P["p1_stop"], P["ft_stop"], P["fused_steps"], None, None)

    # explicit knobs beat the preset, others still fill from it
    ov = rd_sweep.resolve_schedule_args(rd_sweep.parse_args(
        base + ["--schedule", "adaptive", "--n_encode_epochs", "9000",
                "--fused_steps", "4"]))
    assert ov[0] == 9000 and ov[5] == 4 and ov[1] == P["p1_lr"]


def test_rd_sweep_adaptive_schedule_end_to_end(tmp_path):
    """--schedule adaptive drives the full adaptive encode path (cosine-lr
    scanned phase 1, plateau-stopped finetunes, fused coding chunks) through
    rd_sweep's compress() call — tiny knobs override the preset sizes."""
    from recombiner_tpu.cli import rd_sweep

    out = str(tmp_path / "rd.json")
    points = rd_sweep.main(
        [
            "--dataset", "tiny", "--synthetic", "2", "--bitrates", "2.0",
            "--n_em_iters", "2", "--first_epochs", "10", "--later_epochs", "5",
            "--sample_size", "2", "--lr", "2e-3", "--out", out,
            "--schedule", "adaptive", "--n_encode_epochs", "20",
            "--p1_lr", "2e-3", "1e-4", "--p1_samples", "2",
            "--p1_stop", "4", "1e-6", "8", "--ft_stop", "4", "1e-6", "4",
            "--fused_steps", "2",
        ]
    )
    assert len(points) == 1 and points[0]["actual_bitrate"] > 0
    # the adaptive path reports epochs actually spent
    assert points[0]["timings"]["phase1_epochs"] <= 20


def test_rd_sweep_em_schedule_adaptive(tmp_path):
    """--em_schedule adaptive / --em_stop thread through rd_sweep to
    em_train: with a permissive explicit spec and no rate control the EM
    loop stops before the --n_em_iters ceiling (priors/trainer.em_stop)."""
    from recombiner_tpu.cli import rd_sweep

    out = str(tmp_path / "rd.json")
    points = rd_sweep.main(
        [
            "--dataset", "tiny", "--synthetic", "2", "--bitrates", "2.0",
            "--n_em_iters", "12", "--first_epochs", "5", "--later_epochs", "5",
            "--n_encode_epochs", "10", "--finetune_epochs", "1",
            "--sample_size", "2", "--lr", "2e-3", "--out", out,
            "--em_schedule", "adaptive", "--em_stop", "2", "10.0", "3",
            "--no-rate_control", "--em_chunk", "1",
        ]
    )
    assert len(points) == 1 and points[0]["actual_bitrate"] > 0


def test_quality_schedule_preset_resolution():
    """--schedule quality = the RD-parity preset (round 5): the adaptive
    knobs with S=5 phase 1 (p1_samples None -> --sample_size) plus cosine
    finetune lr 4e-4; measured 4-seed mean 42.40 @ 1.953 bpp
    (docs/SCHEDULE.md)."""
    from recombiner_tpu.cli import compress, rd_sweep

    base = ["--test_dir", "d", "--test_idx", "0", "--prior_path", "p.npz",
            "--save_dir", "s"]
    q = compress.resolve_schedule(
        compress.parse_args(base + ["--schedule", "quality"]))
    P = compress.QUALITY_PRESET
    assert q == (P["n_epochs"], P["p1_lr"], None, P["p1_stop"],
                 P["ft_stop"], P["fused_steps"], 4e-4, "cosine")
    # explicit ft_lr beats the preset
    ov = compress.resolve_schedule(compress.parse_args(
        base + ["--schedule", "quality", "--ft_lr", "1e-4"]))
    assert ov[6] == 1e-4 and ov[7] == "cosine"
    # rd_sweep resolves the same preset through the same function
    q2 = rd_sweep.resolve_schedule_args(rd_sweep.parse_args(
        ["--dataset", "cifar", "--bitrates", "2", "--schedule", "quality"]))
    assert q2 == q
