"""det_packed: the one-array detection transport for streaming consumers.

rcnn.py::pack_detections folds boxes/scores/classes/valid/num_instances/
image_size into a single (D+1, 7) f32 array so a remote-tunnel consumer
fetches one array instead of six; predictor.numpy_outputs must unpack it
BIT-EXACTLY to what the six-array path produces."""

import numpy as np
import pytest


def _fake_outputs(n_slots=16, n_valid=5, with_packed=True, seed=0):
    import jax.numpy as jnp

    from densepose_tpu.models.rcnn import GeneralizedRCNN

    rng = np.random.RandomState(seed)
    boxes = (rng.rand(n_slots, 4) * 300).astype(np.float32)
    scores = rng.rand(n_slots).astype(np.float32)
    classes = rng.randint(0, 2, n_slots).astype(np.int32)
    valid = np.zeros(n_slots, bool)
    valid[:n_valid] = True  # score-sorted valid prefix (the real contract)
    outputs = {
        "image_size": jnp.asarray([480, 640], jnp.int32),
        "pred_boxes": jnp.asarray(boxes),
        "scores": jnp.asarray(scores),
        "pred_classes": jnp.asarray(classes),
        "valid": jnp.asarray(valid),
        "num_instances": jnp.asarray(n_valid, jnp.int32),
        "pred_densepose_labels": jnp.asarray(
            rng.randint(0, 25, (n_slots, 8, 8)).astype(np.uint8)),
        "pred_densepose_fine_segm": jnp.asarray(
            rng.randn(n_slots, 8, 8, 25).astype(np.float32)),
    }
    if with_packed:
        outputs["det_packed"] = GeneralizedRCNN.pack_detections(outputs)
    return outputs


@pytest.mark.parametrize("keys", [
    {"pred_densepose_labels"},
    {"pred_densepose_labels", "pred_densepose_fine_segm"},
])
def test_det_packed_unpack_bit_exact(keys):
    from densepose_tpu.predictor import DensePosePredictor

    packed = DensePosePredictor.numpy_outputs(
        _fake_outputs(with_packed=True), keys=keys)
    direct = DensePosePredictor.numpy_outputs(
        _fake_outputs(with_packed=False), keys=keys)
    assert set(packed) == set(direct)
    for k in direct:
        a, b = packed[k], direct[k]
        if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
            a, b = np.asarray(a), np.asarray(b)
            assert a.dtype == b.dtype, (k, a.dtype, b.dtype)
            np.testing.assert_array_equal(a, b, err_msg=k)
        else:
            assert a == b, (k, a, b)


def test_det_packed_fetch_subset():
    """With det_packed present, the keys= fetch touches only det_packed +
    the requested maps (six fewer link round-trips)."""
    from densepose_tpu.predictor import DensePosePredictor

    outputs = _fake_outputs(with_packed=True)
    seen = []

    class Spy:
        def __init__(self, v):
            self.v = v

        def copy_to_host_async(self):
            seen.append(True)

        def __array__(self, dtype=None):
            return np.asarray(self.v, dtype=dtype)

        def __len__(self):
            return len(self.v)

    spied = {k: Spy(np.asarray(v)) for k, v in outputs.items()}
    out = DensePosePredictor.numpy_outputs(
        spied, keys={"pred_densepose_labels"})
    assert len(seen) == 2  # det_packed + labels only
    assert out["num_instances"] == 5
    assert out["pred_boxes"].shape == (5, 4)


def test_det_packed_present_in_forward_outputs():
    """The jitted forward emits det_packed alongside the individual keys."""
    import jax.numpy as jnp

    from densepose_tpu import model_zoo
    from densepose_tpu.predictor import DensePosePredictor

    cfg = model_zoo.get_config("densepose_rcnn_R_50_FPN_s1x").clone()
    cfg.defrost()
    cfg.merge_from_list([
        "INPUT.MIN_SIZE_TEST", "64", "INPUT.MAX_SIZE_TEST", "96",
        "MODEL.RPN.POST_NMS_TOPK_TEST", "20",
        "TEST.DETECTIONS_PER_IMAGE", "4",
    ])
    cfg.freeze()
    pred = DensePosePredictor(cfg, seed=0)
    out = pred(np.zeros((80, 60, 3), np.uint8))
    d = cfg.TEST.DETECTIONS_PER_IMAGE
    assert out["det_packed"].shape == (d + 1, 7)
    body = np.asarray(out["det_packed"])
    np.testing.assert_array_equal(body[:-1, :4], np.asarray(out["pred_boxes"],
                                                            np.float32))
    assert int(body[-1, 0]) == int(out["num_instances"])
    assert (int(body[-1, 1]), int(body[-1, 2])) == (80, 60)
