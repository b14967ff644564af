'''Exact YOLO loss parity vs a torch mirror of the reference loss math
(reference: proposal_generator.py:156-176): masked-selection means for
MSE(sigma_c), MSE(l), BCE obj / noobj with the noobj coefficient.'''
import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from bmt_tpu.models import make_targets_dense, yolo_losses
from tests.torch_ref import t_make_targets


def _torch_yolo_loss(sigma_c, l, sigma_o, obj, noobj, tx, tw, obj_c, noobj_c):
    obj_t = torch.from_numpy(obj)
    noobj_t = torch.from_numpy(noobj)
    sc, ll, so = (torch.from_numpy(sigma_c), torch.from_numpy(l),
                  torch.from_numpy(sigma_o))
    txt, twt = torch.from_numpy(tx), torch.from_numpy(tw)
    gt_obj = obj_t.float()
    loss_x = F.mse_loss(sc[obj_t], txt[obj_t])
    loss_w = F.mse_loss(ll[obj_t], twt[obj_t])
    loss_obj = F.binary_cross_entropy(so[obj_t], gt_obj[obj_t])
    loss_noobj = F.binary_cross_entropy(so[noobj_t], gt_obj[noobj_t])
    total = loss_x + loss_w + obj_c * loss_obj + noobj_c * loss_noobj
    return {'loss_x': loss_x.item(), 'loss_w': loss_w.item(),
            'loss_conf_obj': loss_obj.item(),
            'loss_conf_noobj': loss_noobj.item(), 'total': total.item()}


def test_yolo_loss_values_match_torch(rng):
    B, S, A, E = 2, 12, 4, 3
    anchors = np.sort(rng.uniform(1, 20, size=A)).astype(np.float32)
    stride = 2.56

    centers = rng.uniform(0, S * stride, (B, E)).astype(np.float32)
    lengths = rng.uniform(0.5, 15, (B, E)).astype(np.float32)
    valid = np.ones((B, E), bool)
    rows = np.concatenate([
        np.repeat(np.arange(B), E)[:, None],
        centers.reshape(-1, 1), lengths.reshape(-1, 1)], 1).astype(np.float32)

    targets = make_targets_dense(jnp.asarray(centers), jnp.asarray(lengths),
                                 jnp.asarray(valid), jnp.asarray(anchors),
                                 stride, S)
    obj_ref, noobj_ref, tx_ref, tw_ref = t_make_targets((B, A, S), rows,
                                                        anchors, stride)

    sigma_c = rng.uniform(0.01, 0.99, (B, A, S)).astype(np.float32)
    l = rng.normal(size=(B, A, S)).astype(np.float32)
    sigma_o = rng.uniform(0.01, 0.99, (B, A, S)).astype(np.float32)
    decoded = {'sigma_c': jnp.asarray(sigma_c), 'l': jnp.asarray(l),
               'sigma_o': jnp.asarray(sigma_o)}

    loss, parts = yolo_losses(decoded, targets, obj_coeff=1.0,
                              noobj_coeff=100.0)
    ref = _torch_yolo_loss(sigma_c, l, sigma_o, obj_ref, noobj_ref, tx_ref,
                           tw_ref, 1.0, 100.0)

    np.testing.assert_allclose(float(parts['loss_x']), ref['loss_x'],
                               rtol=1e-4)
    np.testing.assert_allclose(float(parts['loss_w']), ref['loss_w'],
                               rtol=1e-4)
    np.testing.assert_allclose(float(parts['loss_conf_obj']),
                               ref['loss_conf_obj'], rtol=1e-4)
    np.testing.assert_allclose(float(parts['loss_conf_noobj']),
                               ref['loss_conf_noobj'], rtol=1e-4)
    np.testing.assert_allclose(float(loss), ref['total'], rtol=1e-4)
