import numpy as np

from recombiner_tpu.config import AUDIO, CIFAR, KODAK, PROTEIN, VIDEO, get_config


def test_cifar_param_offsets():
    # dims [32,32,32,32,3] -> per-layer out*(in+1): 1056,1056,1056,99
    assert CIFAR.layer_param_counts == (1056, 1056, 1056, 99)
    assert CIFAR.cum_param_sizes == (1056, 2112, 3168, 3267)
    assert CIFAR.n_inr_params == 3267
    assert CIFAR.lpe_spatial == (2, 2)
    assert CIFAR.n_lpe_params == 512
    assert CIFAR.n_coded_params == 3779


def test_audio_video_offsets():
    # audio out=1: last layer 33 -> 3201 total
    assert AUDIO.cum_param_sizes[-1] == 3201
    # video in=34: first layer 32*35=1120 -> 3331 total
    assert VIDEO.layer_param_counts[0] == 1120
    assert VIDEO.cum_param_sizes[-1] == 3331
    assert VIDEO.lpe_spatial == (1, 1, 1)
    assert PROTEIN.cum_param_sizes[-1] == 3267


def test_patch_geometry():
    assert KODAK.patches_per_datapoint == 96
    assert KODAK.rows_level2(96) == 6
    assert KODAK.rows_level3(96) == 1
    assert AUDIO.patches_per_datapoint == 60
    assert AUDIO.rows_level2(60) == 15
    assert VIDEO.patches_per_datapoint == 64


def test_bits_budget_audio_conversion():
    # main_prior_training.py:75-83: kbps * pixels * (3/48000) * 1000
    lo, hi = AUDIO.bits_budget(10.0)
    assert np.isclose(hi, 10.0 * 800 * (3 / 48000) * 1000)
    lo2, hi2 = CIFAR.bits_budget(2.0)
    assert np.isclose(hi2, 2.0 * 1024)
    assert np.isclose(lo2, 1.7 * 1024)


def test_bitrate_of_groups():
    # test_model.py:244-251
    assert np.isclose(CIFAR.bitrate_of_groups(128), 128 * 16 / 1024)
    kodak_bpp = KODAK.bitrate_of_groups(100, 10, 5)
    expect = 100 * 16 / 4096 + 10 * 16 / 4096 / 16 + 5 * 16 / 4096 / 96
    assert np.isclose(kodak_bpp, expect)
    audio_kbps = AUDIO.bitrate_of_groups(50, 5, 2)
    expect = (50 * 16 / 800 + 5 * 16 / 800 / 4 + 2 * 16 / 800 / 60) / (3 / 48000) / 1000
    assert np.isclose(audio_kbps, expect)


def test_get_config():
    assert get_config("cifar") is CIFAR
    for name in ("cifar", "kodak", "audio", "video", "protein"):
        get_config(name).validate()
