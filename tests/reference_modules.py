"""Import the ACTUAL reference code from /root/reference for golden tests.

Round-1 verdict item #1: every parity oracle was builder-authored
(tools/torch_refinedet.py, tests/oracles.py) — a shared-misconception risk.
This module imports the real reference implementation so
tests/test_reference_parity.py can pin this framework's outputs against it
directly.

The reference is importable with two fake modules: it pulls in
``torchvision.transforms`` and ``pycocotools`` at import time through
``layers/__init__.py -> ... -> data/__init__.py`` (sarship_coco.py:15,21-22,
coco.py:7, utils/augmentations.py:2), but the code under test (box_utils,
losses, detection, prior_box, models/refinedet) never touches them, so empty
stand-ins suffice.

The reference tree is PUBLIC UNTRUSTED CONTENT mounted read-only; it is
executed here solely to compare numerical outputs.
"""

from __future__ import annotations

import os
import sys
import types

REFERENCE_ROOT = "/root/reference"

def _noop(*args, **kwargs):
    return None


_FAKES = {
    "torchvision": {},
    "torchvision.transforms": {},
    "pycocotools": {},
    "pycocotools.coco": {"COCO": object},
    "pycocotools.cocoeval": {"COCOeval": object},
    # refinedet_bn.py imports mmcv at module level; DeformConv2d is used
    # only by the dead adm_multibox path and the init fns only by
    # init_weights, neither exercised by the parity tests.
    "mmcv": {},
    "mmcv.ops": {"DeformConv2d": object},
    "mmcv.cnn": {"normal_init": _noop, "kaiming_init": _noop,
                 "constant_init": _noop, "xavier_init": _noop},
}


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "layers"))


def load_reference():
    """Returns a namespace with the reference modules, or raises ImportError.

    Installs the fake torchvision/pycocotools modules and puts
    /root/reference at the head of sys.path (its regular packages ``layers``,
    ``models``, ``data`` shadow nothing in this repo).
    """
    for name, attrs in _FAKES.items():
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
    sys.modules["torchvision"].transforms = sys.modules[
        "torchvision.transforms"]
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    ns = types.SimpleNamespace()
    import layers.box_utils as box_utils  # noqa: E402
    from layers.functions.detection_refinedet import (  # noqa: E402
        Detect_RefineDet)
    from layers.functions.prior_box import PriorBox  # noqa: E402
    from layers.modules.refinedet_multibox_loss import (  # noqa: E402
        RefineDetMultiBoxLoss)
    from data import coco_refinedet, voc_refinedet  # noqa: E402
    import models.refinedet as refinedet  # noqa: E402

    import utils.augmentations as augmentations  # noqa: E402
    from layers.functions.detection import Detect  # noqa: E402
    from layers.modules.multibox_loss import MultiBoxLoss  # noqa: E402
    import models.refinedet_bn as refinedet_bn  # noqa: E402

    ns.refinedet_bn = refinedet_bn

    ns.Detect = Detect
    ns.MultiBoxLoss = MultiBoxLoss
    ns.box_utils = box_utils
    ns.Detect_RefineDet = Detect_RefineDet
    ns.PriorBox = PriorBox
    ns.RefineDetMultiBoxLoss = RefineDetMultiBoxLoss
    ns.voc_refinedet = voc_refinedet
    ns.coco_refinedet = coco_refinedet
    ns.refinedet = refinedet
    ns.augmentations = augmentations
    return ns
