import json
import os.path as osp

import numpy as np

from refinedet_tpu.utils import Logger, Timer, parse_log
from refinedet_tpu.utils.plot import plot_loss, plot_map


def test_logger_tee(tmp_path, capsys):
    path = str(tmp_path / "log.txt")
    log = Logger(path)
    log.write("hello\n")
    log.flush()
    log.close()
    assert open(path).read() == "hello\n"
    assert "hello" in capsys.readouterr().out


def test_timer_average():
    t = Timer()
    for _ in range(3):
        t.tic()
        t.toc()
    assert t.calls == 3
    assert t.average_time >= 0


LOG_LINE = ("Epoch:1/2 || Epochiter: 1/1 || Iter: {}/10 || "
            "ARM_L Loss: {:.4f} ARM_C Loss: 2.0000 ODM_L Loss: 1.0000 "
            "ODM_C Loss: 0.5000 loss: {:.4f} || LR: 0.00100000 || "
            "Batchtime: 0.5 s || ETA: 0:00:05\n")


def test_parse_log_and_plot(tmp_path):
    path = str(tmp_path / "log.txt")
    with open(path, "w") as f:
        for i in range(5):
            f.write(LOG_LINE.format(i + 1, 4.0 - i * 0.5, 7.5 - i * 0.5))
    s = parse_log(path)
    assert len(s["iter"]) == 5
    np.testing.assert_allclose(s["arm_loss_l"],
                               [4.0, 3.5, 3.0, 2.5, 2.0])
    out = plot_loss(path, str(tmp_path / "loss.png"))
    assert out is None or osp.exists(out)


def test_plot_map(tmp_path):
    stats = {"ap": [0.5, 0.6], "ap50": [0.9, 0.95], "ap75": [0.4, 0.5],
             "epoch": [10, 20]}
    p = str(tmp_path / "ap_stats.json")
    with open(p, "w") as f:
        json.dump(stats, f)
    out = plot_map(p, str(tmp_path / "ap.png"))
    assert out is None or osp.exists(out)


def test_init_fans_match_torch_convention():
    """xavier/kaiming fans include the receptive field (torch semantics):
    a 3x3 256->512 HWIO kernel has fan_in 2304, fan_out 4608."""
    import numpy as np
    from refinedet_tpu.models.initializers import (_fans, kaiming_init,
                                                   xavier_init)
    assert _fans((3, 3, 256, 512)) == (3 * 3 * 256, 3 * 3 * 512)
    assert _fans((256, 512)) == (256, 512)
    rng = np.random.RandomState(0)
    k = xavier_init(rng, (3, 3, 256, 512), distribution="uniform")
    bound = np.sqrt(6.0 / (2304 + 4608))
    assert abs(k).max() <= bound + 1e-7
    k = kaiming_init(rng, (3, 3, 64, 64), mode="fan_out",
                     distribution="uniform")
    bound = np.sqrt(2.0) * np.sqrt(3.0 / (9 * 64))
    assert abs(k).max() <= bound + 1e-7


def test_anchor_config_num_classes_tracks_request():
    from refinedet_tpu.models.builder import anchor_config_for
    assert anchor_config_for(320, 21).num_classes == 21
    assert anchor_config_for(320, 2).num_classes == 2
    assert anchor_config_for(320, 81).num_classes == 81
    assert anchor_config_for(512, 81).num_classes == 81


def test_reinit_heads_xavier():
    from refinedet_tpu.models.initializers import reinit_heads_xavier
    params = {
        "vgg_conv1_1": {"kernel": np.ones((3, 3, 3, 64), np.float32),
                        "bias": np.ones(64, np.float32)},
        "arm_loc0": {"kernel": np.ones((3, 3, 512, 12), np.float32),
                     "bias": np.ones(12, np.float32)},
    }
    out = reinit_heads_xavier(params)
    assert (out["vgg_conv1_1"]["kernel"] == 1).all()  # untouched
    assert not (out["arm_loc0"]["kernel"] == 1).all()
    assert (out["arm_loc0"]["bias"] == 0).all()
