"""Multi-device (8-way virtual CPU mesh) data-parallel tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from refinedet_tpu.config import TrainConfig
from refinedet_tpu.models import build_refinedet
from refinedet_tpu.parallel import (batch_sharding, make_mesh, replicate,
                                    shard_batch)
from refinedet_tpu.train import (create_train_state, make_lr_schedule,
                                 make_optimizer, make_train_step)
from refinedet_tpu.data.collate import Batch
from test_train_step import _fake_batch


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_batch_sharding_splits_dim0():
    mesh = make_mesh()
    x = np.zeros((16, 4), np.float32)
    sx = jax.device_put(x, batch_sharding(mesh))
    assert len(sx.addressable_shards) == 8
    assert sx.addressable_shards[0].data.shape == (2, 4)


def test_dp_train_step_runs_on_mesh(rng):
    mesh = make_mesh()
    model = build_refinedet("train", 320, 2)
    cfg = TrainConfig(batch_size=8, max_boxes=8)
    sched = make_lr_schedule(cfg.lr, cfg.gamma, epoch_size=4, max_epoch=9)
    tx = make_optimizer(sched)
    state = replicate(mesh, create_train_state(
        model, jax.random.PRNGKey(0), tx))
    step = make_train_step(model, tx, cfg, mesh)

    images, boxes, labels, valid = _fake_batch(rng, b=8)
    batch = shard_batch(mesh, Batch(images, boxes, labels, valid))
    state, metrics = step(state, batch.images, batch.boxes, batch.labels,
                          batch.valid)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
    # params stay replicated
    leaf = jax.tree.leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_dp_matches_single_device(rng):
    """Gradient all-reduce over the mesh == single-device step on the same
    global batch (the DataParallel-equivalence property)."""
    model = build_refinedet("train", 320, 2)
    cfg = TrainConfig(batch_size=8, max_boxes=8)
    tx = make_optimizer(lambda s: 1e-3)
    batch = _fake_batch(rng, b=8)

    # single device
    state1 = create_train_state(model, jax.random.PRNGKey(0), tx)
    step1 = make_train_step(model, tx, cfg)
    state1, m1 = step1(state1, *(jnp.asarray(x) for x in batch))

    # 8-device mesh
    mesh = make_mesh()
    state8 = replicate(mesh, create_train_state(
        model, jax.random.PRNGKey(0), tx))
    step8 = make_train_step(model, tx, cfg, mesh)
    sb = shard_batch(mesh, Batch(*batch))
    state8, m8 = step8(state8, sb.images, sb.boxes, sb.labels, sb.valid)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-4)
    p1 = jax.tree.leaves(state1.params)[0]
    p8 = jax.tree.leaves(state8.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=1e-5)


def test_distributed_helpers_single_process(monkeypatch):
    """maybe_initialize is a no-op without a coordinator; index helpers
    match the loader's shard_id/num_shards contract."""
    from refinedet_tpu.parallel import distributed
    for var in ("JAX_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
                "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    assert distributed.maybe_initialize() is False
    assert distributed.process_index() == 0
    assert distributed.process_count() == 1


def test_dp_sp_mesh_matches_single_device(rng):
    """2-D (data x space) mesh: batch sharded 4-way, image height sharded
    2-way. XLA SPMD inserts conv halo exchanges; the step must equal the
    single-device step on the same global batch."""
    from refinedet_tpu.parallel import image_sharding

    model = build_refinedet("train", 320, 2)
    cfg = TrainConfig(batch_size=4, max_boxes=8)
    tx = make_optimizer(lambda s: 1e-3)
    batch = _fake_batch(rng, b=4)

    state1 = create_train_state(model, jax.random.PRNGKey(0), tx)
    step1 = make_train_step(model, tx, cfg)
    state1, m1 = step1(state1, *(jnp.asarray(x) for x in batch))

    mesh = make_mesh(8, axis_names=("data", "space"), shape=(4, 2))
    assert image_sharding(mesh).spec == jax.sharding.PartitionSpec(
        "data", "space")
    state2 = replicate(mesh, create_train_state(
        model, jax.random.PRNGKey(0), tx))
    step2 = make_train_step(model, tx, cfg, mesh)
    sb = shard_batch(mesh, Batch(*batch))
    assert len(sb.images.addressable_shards) == 8
    assert sb.images.addressable_shards[0].data.shape[:2] == (1, 160)
    state2, m2 = step2(state2, sb.images, sb.boxes, sb.labels, sb.valid)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    p1 = jax.tree.leaves(state1.params)[0]
    p2 = jax.tree.leaves(state2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)


def test_evaluator_on_mesh(tmp_path):
    """Multi-device batched eval: images shard over the mesh."""
    import jax
    import sys
    sys.path.insert(0, "tests")
    from data_fixtures import make_coco_dataset
    from refinedet_tpu.config import DetectConfig
    from refinedet_tpu.data import BaseTransform, COCODetection
    from refinedet_tpu.eval import Evaluator
    root = str(tmp_path)
    make_coco_dataset(root, split="test", num_images=8, img_size=64)
    ds = COCODetection(root, [("sarship", "test")], None)
    mesh = make_mesh()
    model = build_refinedet("test", 320, 2)
    variables = model.init(jax.random.PRNGKey(0))
    ev = Evaluator(model, ds, DetectConfig(num_classes=2),
                   BaseTransform(320, (98.1,) * 3), batch_size=8,
                   nms_top_k=64, mesh=mesh, log=lambda s: None)
    all_boxes = ev.run(variables)
    assert len(all_boxes[1]) == 8
