import numpy as np
import pytest

from refinedet_tpu.data import (BaseTransform, COCODetection, DataLoader,
                                SSDAugmentation, detection_collate)
from data_fixtures import make_coco_dataset, make_voc_dataset


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ssdd"))
    make_coco_dataset(root, num_images=6)
    make_coco_dataset(root, split="test", num_images=4, seed=1)
    return root


def test_coco_dataset_targets(coco_root):
    ds = COCODetection(coco_root, [("sarship", "train")], None)
    assert len(ds) == 6
    img, boxes, labels = ds[0]
    assert img.shape == (96, 96, 3)
    assert boxes.shape[1] == 4 and len(boxes) == len(labels)
    assert (labels >= 1).all()  # 1-based foreground labels
    # absolute pixel coords within image bounds
    assert boxes.min() >= 0 and boxes.max() <= 95


def test_augmentation_deterministic(coco_root):
    ds = COCODetection(coco_root, [("sarship", "train")], None)
    img, boxes, labels = ds[1]
    aug = SSDAugmentation(size=64, mean=(98.1, 98.1, 98.1))
    rng1 = np.random.default_rng(42)
    rng2 = np.random.default_rng(42)
    out1 = aug(img, boxes, labels, rng1)
    out2 = aug(img, boxes, labels, rng2)
    np.testing.assert_array_equal(out1[0], out2[0])
    np.testing.assert_array_equal(out1[1], out2[1])


def test_augmentation_output_contract(coco_root):
    ds = COCODetection(coco_root, [("sarship", "train")], None)
    aug = SSDAugmentation(size=64, mean=(98.1, 98.1, 98.1))
    for i in range(len(ds)):
        img, boxes, labels = ds[i]
        for seed in range(5):
            rng = np.random.default_rng(seed)
            aimg, aboxes, alabels = aug(img, boxes, labels, rng)
            assert aimg.shape == (64, 64, 3)
            assert aimg.dtype == np.float32
            assert len(aboxes) == len(alabels) >= 1
            # normalized point-form, well-ordered boxes
            assert aboxes.min() >= -1e-5 and aboxes.max() <= 1 + 1e-5
            assert (aboxes[:, 2:] >= aboxes[:, :2] - 1e-6).all()


def test_voc_dataset_roundtrip(tmp_path):
    """Synthetic VOCdevkit tree parses back: 0-based absolute coords,
    1-based labels, raw accessors consistent."""
    from refinedet_tpu.data import VOCDetection
    root = str(tmp_path)
    make_voc_dataset(root, num_images=3, img_size=96)
    ds = VOCDetection(root, [("2007", "trainval")], None)
    assert len(ds) == 3
    img, boxes, labels = ds[0]
    assert img.shape == (96, 96, 3)
    assert boxes.shape[1] == 4 and boxes.shape[0] >= 1
    assert boxes.min() >= 0 and boxes.max() <= 95
    assert labels.min() >= 1 and labels.max() <= 20
    ids, anno = ds.pull_anno(0)
    np.testing.assert_array_equal(np.asarray(anno)[:, :4], boxes)
    assert ds.pull_image(0).shape == (96, 96, 3)


def test_augmentation_varies_across_epochs(coco_root):
    """set_epoch must re-randomize per-sample draws: the same index in
    different epochs gets a different augmentation, while the same
    (seed, epoch, index) stays deterministic."""
    ds = COCODetection(coco_root, [("sarship", "train")],
                       SSDAugmentation(size=64, mean=(98.1, 98.1, 98.1)),
                       seed=7)
    ds.set_epoch(0)
    img_e0, _, _ = ds[0]
    img_e0_again, _, _ = ds[0]
    np.testing.assert_array_equal(img_e0, img_e0_again)
    ds.set_epoch(1)
    img_e1, _, _ = ds[0]
    assert not np.array_equal(img_e0, img_e1)


def test_loader_advances_dataset_epoch(coco_root):
    ds = COCODetection(coco_root, [("sarship", "train")],
                       SSDAugmentation(size=64, mean=(98.1, 98.1, 98.1)))
    loader = DataLoader(ds, batch_size=2, max_boxes=8, num_workers=1,
                        shuffle=False, seed=0)
    first = [np.array(b.images) for b in loader]
    second = [np.array(b.images) for b in loader]
    assert ds.epoch == 1  # loader called set_epoch(1) for its 2nd pass
    assert not np.array_equal(first[0], second[0])


def test_loader_early_abort_does_not_wedge(coco_root):
    """Breaking out of an epoch must unblock the producer thread; the
    next iteration starts cleanly (regression: producer parked forever
    in a blocking put on a full prefetch queue)."""
    import threading
    ds = COCODetection(coco_root, [("sarship", "train")], None)
    loader = DataLoader(ds, batch_size=1, max_boxes=8, num_workers=1,
                        shuffle=False, seed=0, prefetch=1)
    before = threading.active_count()
    for _ in range(3):
        for batch in loader:
            break  # abandon each epoch after one batch
    import time
    time.sleep(0.5)  # give stranded producers time to exit
    assert threading.active_count() <= before + 1
    assert sum(1 for _ in loader) == len(loader)  # full pass still works


def test_augmentation_handles_empty_gt():
    """Images with zero GT boxes (all-difficult VOC, annotation-free COCO)
    must pass through the full augmentation chain without crashing."""
    aug = SSDAugmentation(size=64, mean=(98.1, 98.1, 98.1))
    img = np.random.RandomState(0).randint(
        0, 255, (96, 96, 3)).astype(np.uint8)
    empty_boxes = np.zeros((0, 4), np.float32)
    empty_labels = np.zeros((0,), np.int32)
    for seed in range(10):  # cover every crop mode draw
        rng = np.random.default_rng(seed)
        aimg, aboxes, alabels = aug(img, empty_boxes, empty_labels, rng)
        assert aimg.shape == (64, 64, 3)
        assert aboxes.shape == (0, 4) and alabels.shape == (0,)


def test_loader_process_workers(coco_root):
    """use_processes=True (reference-style worker processes) yields the
    same batches as the in-process path — spawn-safe, picklable dataset,
    per-epoch set_epoch propagated through the worker initializer."""
    ds = COCODetection(coco_root, [("sarship", "train")],
                       SSDAugmentation(size=64, mean=(98.1, 98.1, 98.1)),
                       seed=3)
    ref = DataLoader(ds, batch_size=2, max_boxes=8, num_workers=1,
                     shuffle=False, seed=0)
    ref_batches = [np.array(b.images) for b in ref]

    ds2 = COCODetection(coco_root, [("sarship", "train")],
                        SSDAugmentation(size=64, mean=(98.1, 98.1, 98.1)),
                        seed=3)
    proc = DataLoader(ds2, batch_size=2, max_boxes=8, num_workers=2,
                      shuffle=False, seed=0, use_processes=True)
    proc_batches = [np.array(b.images) for b in proc]
    assert len(ref_batches) == len(proc_batches)
    for a, b in zip(ref_batches, proc_batches):
        np.testing.assert_array_equal(a, b)


def test_loader_propagates_producer_errors(coco_root):
    """A failure inside the producer thread (dataset, collate, device_put)
    must raise in the consumer, not hang the iteration."""
    ds = COCODetection(coco_root, [("sarship", "train")], None)
    loader = DataLoader(ds, batch_size=2, max_boxes=8, num_workers=1,
                        shuffle=False, seed=0,
                        device_put=lambda b: (_ for _ in ()).throw(
                            ValueError("bad targets")))
    with pytest.raises(ValueError, match="bad targets"):
        for _ in loader:
            pass


def test_base_transform_shape(coco_root):
    ds = COCODetection(coco_root, [("sarship", "train")], None)
    img, _ = ds.pull_image(0)
    out = BaseTransform(320, (98.1, 98.1, 98.1))(img)
    assert out.shape == (320, 320, 3)
    assert out.dtype == np.float32


def test_collate_pads_and_masks(coco_root):
    ds = COCODetection(coco_root, [("sarship", "train")], None)
    aug = SSDAugmentation(size=64, mean=(98.1,) * 3)
    samples = []
    for i in range(3):
        img, boxes, labels = ds[i]
        samples.append(aug(img, boxes, labels, np.random.default_rng(i)))
    batch = detection_collate(samples, max_boxes=10)
    assert batch.images.shape == (3, 64, 64, 3)
    assert batch.boxes.shape == (3, 10, 4)
    assert batch.labels.shape == (3, 10)
    for i, (_, boxes, _) in enumerate(samples):
        assert batch.valid[i].sum() == min(len(boxes), 10)
        assert (batch.labels[i][~batch.valid[i]] == 0).all()


def test_loader_epoch(coco_root):
    ds = COCODetection(
        coco_root, [("sarship", "train")],
        SSDAugmentation(size=64, mean=(98.1,) * 3))
    loader = DataLoader(ds, batch_size=2, max_boxes=8, num_workers=2,
                        seed=3)
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        assert b.images.shape == (2, 64, 64, 3)
        assert b.valid.any()


def test_loader_shuffles_across_epochs(coco_root):
    ds = COCODetection(coco_root, [("sarship", "train")], None)
    loader = DataLoader(ds, batch_size=2, num_workers=1, seed=5)
    e0 = loader._epoch_indices().tolist()
    loader.epoch = 1
    e1 = loader._epoch_indices().tolist()
    assert sorted(e0) == sorted(e1)
    assert e0 != e1


def test_evaluate_detections_perfect_score(coco_root):
    ds = COCODetection(coco_root, [("sarship", "test")], None)
    # Feed ground truth back as detections: AP must be 1.0.
    all_boxes = [[[] for _ in range(len(ds))] for _ in range(2)]
    for i in range(len(ds)):
        _, target = ds.pull_image(i)
        dets = np.hstack([target[:, :4],
                          np.full((len(target), 1), 0.9, np.float32)])
        all_boxes[1][i] = dets
    stats = ds.evaluate_detections(all_boxes, None)
    assert stats[0] > 0.99   # AP
    assert stats[1] > 0.99   # AP50


def test_evaluate_detections_misses_lower_ap(coco_root):
    ds = COCODetection(coco_root, [("sarship", "test")], None)
    all_boxes = [[[] for _ in range(len(ds))] for _ in range(2)]
    for i in range(len(ds)):
        _, target = ds.pull_image(i)
        dets = np.hstack([target[:1, :4],
                          np.full((1, 1), 0.9, np.float32)])
        all_boxes[1][i] = dets  # only first GT detected per image
    stats = ds.evaluate_detections(all_boxes, None)
    n_gt = sum(len(ds.annotations[i]) for i in range(len(ds)))
    expected_recall = len(ds) / n_gt
    assert stats[1] == pytest.approx(expected_recall, abs=0.05)


def test_loader_sharding(coco_root):
    ds = COCODetection(coco_root, [("sarship", "train")], None)
    shard0 = DataLoader(ds, batch_size=1, num_workers=1, seed=4,
                        shard_id=0, num_shards=2)
    shard1 = DataLoader(ds, batch_size=1, num_workers=1, seed=4,
                        shard_id=1, num_shards=2)
    i0 = shard0._epoch_indices().tolist()
    i1 = shard1._epoch_indices().tolist()
    assert len(i0) == len(i1) == 3
    assert not set(i0) & set(i1)          # disjoint
    assert len(shard0) == 3
