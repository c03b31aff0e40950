"""Torch oracle for the ScribbleVC class-representation memory math.

Reimplements /root/reference/code/networks/scribbleVC_ACDC.py:670-739
(training branch) line-by-line in torch and diffs it — values AND
gradients — against the flax `class_memory_update` on identical inputs
(VERDICT round-2 item 3b). The gradient check pins the subtle part: the
reference detaches only the OLD history term of the buffer update, so the
feature injection backprops through this step's fresh class
representation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from wsl4mis_tpu.models.scribblevc import class_memory_update  # noqa: E402

B, H, W, C = 6, 4, 4, 8
T, E = 5, 8
NCLS = 3
HW0 = 0.5


def _torch_update(hf, tf, conv_cls, tran_cls, hist_conv, hist_tran,
                  initialized, wc, wt):
    """scribbleVC_ACDC.py:674-739 with NHWC layouts and linear test heads.

    hist_conv/hist_tran are None when uninitialized (the reference's
    `self.hist_conv_cls_rep is None` state).
    """

    def conv_head(z):  # stand-in for conv_cls_head + spatial mean
        return torch.einsum("ihwc,ck->ik", z, wc) / (H * W)

    def trans_head(z):
        return z @ wt

    # (1) conv representation (:674-697)
    rep = torch.einsum("bi,bhwc->ihwc", conv_cls, hf) / B
    if initialized:
        ema = HW0 * hist_conv + (1 - HW0) * rep
    else:
        ema = rep
    rep_prob = conv_head(ema)
    is_max = torch.eq(
        torch.argmax(rep_prob, dim=1), torch.arange(NCLS)
    ).float()
    rep_m = torch.einsum("b,bhwc->bhwc", is_max, rep)
    w_vec = torch.where(is_max == 0, torch.tensor(1.0), torch.tensor(HW0))
    if initialized:
        new_hist = (
            torch.einsum("b,bhwc->bhwc", w_vec, hist_conv).detach()
            + torch.einsum("b,bhwc->bhwc", 1 - w_vec, rep_m)
        )
    else:
        new_hist = rep_m
    conv_prob = conv_cls.sigmoid()
    ok = torch.all(
        torch.logical_or(
            torch.logical_not(torch.where(conv_prob < 0.5, 0, 1)), is_max
        ),
        dim=1, keepdim=True,
    )
    weight = torch.where(
        conv_prob < 0.5, torch.zeros_like(conv_prob), conv_prob
    ) * ok
    dh = torch.einsum("ab,bhwc->ahwc", weight, new_hist)

    # (2) trans representation (:707-739)
    trep = torch.einsum("bi,bjk->ijk", tran_cls, tf) / B
    if initialized:
        tema = HW0 * hist_tran + (1 - HW0) * trep
    else:
        tema = trep
    trep_prob = trans_head(tema[:, 0])
    t_is_max = torch.eq(
        torch.argmax(trep_prob, dim=1), torch.arange(NCLS)
    ).float()
    trep_m = torch.einsum("b,bjk->bjk", t_is_max, trep)
    t_w = torch.where(t_is_max == 0, torch.tensor(1.0), torch.tensor(HW0))
    if initialized:
        new_t_hist = (
            torch.einsum("b,bjk->bjk", t_w, hist_tran).detach()
            + torch.einsum("b,bjk->bjk", 1 - t_w, trep_m)
        )
    else:
        new_t_hist = trep_m
    t_ok = torch.all(
        torch.logical_or(
            torch.logical_not(torch.where(conv_prob < 0.5, 0, 1)), t_is_max
        ),
        dim=1, keepdim=True,
    )
    tran_prob = tran_cls.sigmoid()
    t_weight = torch.where(
        tran_prob < 0.5, torch.zeros_like(tran_prob), tran_prob
    ) * t_ok
    t_rep = torch.einsum("ab,bjk->ajk", t_weight, new_t_hist)
    return dh, t_rep, new_hist, new_t_hist


@pytest.mark.parametrize("initialized", [0.0, 1.0])
def test_memory_update_matches_torch_oracle(initialized):
    rng = np.random.RandomState(int(initialized) + 11)
    hf = rng.randn(B, H, W, C).astype(np.float32)
    tf = rng.randn(B, T, E).astype(np.float32)
    conv_cls = rng.randn(B, NCLS).astype(np.float32)
    tran_cls = rng.randn(B, NCLS).astype(np.float32)
    hist_conv = rng.randn(NCLS, H, W, C).astype(np.float32)
    hist_tran = rng.randn(NCLS, T, E).astype(np.float32)
    wc = rng.randn(C, NCLS).astype(np.float32)
    wt = rng.randn(E, NCLS).astype(np.float32)
    ct_dh = rng.randn(B, H, W, C).astype(np.float32)
    ct_tr = rng.randn(B, T, E).astype(np.float32)

    # --- jax side: values + grads wrt (hf, tf, conv_cls, tran_cls) ---
    def jax_fn(hf_, tf_, cc_, tc_):
        return class_memory_update(
            hf_, tf_, cc_, tc_,
            jnp.asarray(hist_conv), jnp.asarray(hist_tran),
            jnp.asarray(initialized), HW0,
            lambda z: jnp.einsum("ihwc,ck->ik", z, jnp.asarray(wc)) / (H * W),
            lambda z: z @ jnp.asarray(wt),
        )

    vals = jax_fn(jnp.asarray(hf), jnp.asarray(tf), jnp.asarray(conv_cls),
                  jnp.asarray(tran_cls))

    def jax_loss(hf_, tf_, cc_, tc_):
        dh, t_rep, _, _ = jax_fn(hf_, tf_, cc_, tc_)
        return jnp.sum(dh * ct_dh) + jnp.sum(t_rep * ct_tr)

    jgrads = jax.grad(jax_loss, argnums=(0, 1, 2, 3))(
        jnp.asarray(hf), jnp.asarray(tf), jnp.asarray(conv_cls),
        jnp.asarray(tran_cls),
    )

    # --- torch side ---
    thf = torch.tensor(hf, requires_grad=True)
    ttf = torch.tensor(tf, requires_grad=True)
    tcc = torch.tensor(conv_cls, requires_grad=True)
    ttc = torch.tensor(tran_cls, requires_grad=True)
    tvals = _torch_update(
        thf, ttf, tcc, ttc,
        torch.tensor(hist_conv) if initialized else None,
        torch.tensor(hist_tran) if initialized else None,
        bool(initialized), torch.tensor(wc), torch.tensor(wt),
    )
    loss = (tvals[0] * torch.tensor(ct_dh)).sum() + (
        tvals[1] * torch.tensor(ct_tr)
    ).sum()
    loss.backward()

    names = ["dh", "t_rep", "new_hist_conv", "new_hist_tran"]
    for name, jv, tv in zip(names, vals, tvals):
        np.testing.assert_allclose(
            np.asarray(jv), tv.detach().numpy(), atol=2e-5, rtol=1e-5,
            err_msg=name,
        )
    for name, jg, tg in zip(
        ["d_hf", "d_tf", "d_conv_cls", "d_tran_cls"],
        jgrads, [thf.grad, ttf.grad, tcc.grad, ttc.grad],
    ):
        np.testing.assert_allclose(
            np.asarray(jg), tg.numpy(), atol=2e-5, rtol=1e-5, err_msg=name
        )
