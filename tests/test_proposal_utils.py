'''Proposal post-processing: tIoU forms, top-k stability, trimming, NMS.'''
import numpy as np

from bmt_tpu.utils.proposal_utils import (get_corner_coords,
                                          non_max_suppression,
                                          postprocess_preds,
                                          remove_very_short_segments,
                                          select_topk_predictions,
                                          tiou_vectorized, trim_proposals)


def test_tiou_center_length_form():
    a = np.array([[5.0, 10.0]])      # center 5, length 10 -> [0, 10]
    b = np.array([[10.0, 10.0]])     # [5, 15]
    t = tiou_vectorized(a, b)
    assert t.shape == (1, 1)
    np.testing.assert_allclose(t[0, 0], 5 / 15, atol=1e-6)


def test_tiou_corner_form_and_lengths_only():
    a = np.array([[0.0, 10.0]])
    b = np.array([[5.0, 15.0]])
    t = tiou_vectorized(a, b, center_length=False)
    np.testing.assert_allclose(t[0, 0], 5 / 15, atol=1e-6)

    la = np.array([[4.0]])
    lb = np.array([[8.0]])
    t = tiou_vectorized(la, lb, without_center_coords=True)
    np.testing.assert_allclose(t[0, 0], 0.5, atol=1e-6)


def test_select_topk_stable_ordering():
    # equal confidences keep original order (torch stable argsort parity)
    preds = np.zeros((1, 4, 3), np.float32)
    preds[0, :, 0] = [10, 20, 30, 40]
    preds[0, :, 2] = [0.5, 0.9, 0.5, 0.9]
    out = select_topk_predictions(preds, k=3)
    assert out[0, :, 0].tolist() == [20, 40, 10]


def test_corner_trim_short():
    preds = np.array([[[5.0, 4.0, 0.9],      # [3, 7]
                       [1.0, 10.0, 0.8],     # [-4, 6] -> [0, 6]
                       [9.0, 0.1, 0.7]]])    # [8.95, 9.05] short
    corner = get_corner_coords(preds)
    np.testing.assert_allclose(corner[0, 0, :2], [3, 7])
    trimmed = trim_proposals(corner, [6.5])
    np.testing.assert_allclose(trimmed[0, 1, :2], [0, 6])   # start clipped
    np.testing.assert_allclose(trimmed[0, 0, :2], [3, 6.5])  # end clipped
    kept = remove_very_short_segments(trimmed, 0.2)
    assert kept.shape[1] == 2  # the 0.1-long segment dropped


def test_nms_greedy_suppression():
    # confidence-sorted corner-form proposals
    preds = np.array([[0.0, 10.0, 0.9],
                      [1.0, 11.0, 0.8],    # iou with first ~ 9/12 > 0.5
                      [20.0, 30.0, 0.7],
                      [21.0, 29.0, 0.6]])  # iou with third 8/10 > 0.5
    out = non_max_suppression(preds, 0.5)
    np.testing.assert_allclose(out[:, 2], [0.9, 0.7])

    # threshold above all overlaps keeps everything
    out = non_max_suppression(preds, 0.99)
    assert out.shape[0] == 4


def test_postprocess_pipeline():
    class Cfg:
        max_prop_per_vid = 2
    preds = np.zeros((1, 3, 3), np.float32)
    preds[0] = [[5.0, 4.0, 0.5], [100.0, 4.0, 0.9], [2.0, 2.0, 0.7]]
    out = postprocess_preds(preds, Cfg, {'duration_in_secs': [10.0]})
    assert out.shape == (1, 2, 3)
    # best-conf first: center 100 len 4 -> [98, 102] -> trimmed [10, 10]
    np.testing.assert_allclose(out[0, 0, :2], [10, 10])
    np.testing.assert_allclose(out[0, 1, :2], [1, 3])
