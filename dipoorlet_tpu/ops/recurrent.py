"""Recurrent ops: ONNX LSTM / GRU as lax.scan loops.

The reference runs these through onnxruntime
(/root/reference/dipoorlet/forward_net.py:195-201); here the sequence
loop is a lax.scan over a static sequence length — fully traceable, so
recurrent encoders calibrate like any other graph.  Supported: layout 0,
forward/reverse/bidirectional, biases, initial states, default
activations (sigmoid/tanh), optional clip.  Not supported (raise):
per-element `sequence_lens` shorter than the tensor (data-dependent
shapes) and custom activation lists."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .registry import register


def _check_plain(ctx, default_acts):
    if int(ctx.attrs.get("layout", 0)):
        raise NotImplementedError(
            "RNN layout=1 (batch-major) is not supported; re-export the "
            "model with the default seq-major layout 0")
    acts = ctx.attrs.get("activations")
    if acts:
        names = [a.decode().lower() if isinstance(a, bytes) else str(a).lower()
                 for a in acts]
        if names != default_acts * (len(names) // len(default_acts)):
            raise NotImplementedError(
                f"custom RNN activations {names} are not supported "
                f"(default {default_acts} only)")


def _clipper(ctx):
    clip = ctx.attrs.get("clip")
    if clip is None:
        return lambda x: x
    c = float(clip)
    return lambda x: jnp.clip(x, -c, c)


def _directions(ctx):
    d = ctx.attrs.get("direction", "forward")
    if isinstance(d, bytes):
        d = d.decode()
    return {"forward": [False], "reverse": [True],
            "bidirectional": [False, True]}[d]


def _run_scan(cell, x, h0_all, reverse_flags):
    """x (T, B, I); returns Y (T, D, B, H) and the final per-direction
    carries (list of whatever the cell carries)."""
    ys, finals = [], []
    for d, rev in enumerate(reverse_flags):
        carry, y = lax.scan(cell[d], h0_all[d], x, reverse=rev)
        ys.append(y)        # (T, B, H)
        finals.append(carry)
    return jnp.stack(ys, axis=1), finals


@register("LSTM", static_inputs=(4,))
def lstm(ctx, x, w, r, b=None, sequence_lens=None, initial_h=None,
         initial_c=None, p=None):
    """ONNX gate order iofc; x (T,B,I), w (D,4H,I), r (D,4H,H), b (D,8H)."""
    import numpy as np
    _check_plain(ctx, ["sigmoid", "tanh", "tanh"])
    if sequence_lens is not None:
        sl = np.asarray(sequence_lens)
        if sl.size and not (sl == x.shape[0]).all():
            raise NotImplementedError("per-element sequence_lens unsupported")
    if p is not None:
        raise NotImplementedError("LSTM peepholes unsupported")
    hidden = int(ctx.attrs["hidden_size"])
    clip = _clipper(ctx)
    t, bsz, _ = x.shape
    revs = _directions(ctx)
    nd = len(revs)

    def make_cell(d):
        wi, wo, wf, wc = jnp.split(w[d], 4, axis=0)
        ri, ro, rf, rc = jnp.split(r[d], 4, axis=0)
        if b is not None:
            bs = jnp.split(b[d], 8)
            bi, bo, bf, bc = (bs[0] + bs[4], bs[1] + bs[5],
                              bs[2] + bs[6], bs[3] + bs[7])
        else:
            bi = bo = bf = bc = 0.0

        def cell(carry, xt):
            h, c = carry
            i = jax.nn.sigmoid(clip(xt @ wi.T + h @ ri.T + bi))
            o = jax.nn.sigmoid(clip(xt @ wo.T + h @ ro.T + bo))
            f = jax.nn.sigmoid(clip(xt @ wf.T + h @ rf.T + bf))
            g = jnp.tanh(clip(xt @ wc.T + h @ rc.T + bc))
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        return cell

    cells = [make_cell(d) for d in range(nd)]
    z = jnp.zeros((bsz, hidden), x.dtype)
    h0 = [initial_h[d] if initial_h is not None else z for d in range(nd)]
    c0 = [initial_c[d] if initial_c is not None else z for d in range(nd)]
    y, finals = _run_scan(cells, x, [(h0[d], c0[d]) for d in range(nd)], revs)
    y_h = jnp.stack([f[0] for f in finals], axis=0)
    y_c = jnp.stack([f[1] for f in finals], axis=0)
    return y, y_h, y_c


@register("GRU", static_inputs=(4,))
def gru(ctx, x, w, r, b=None, sequence_lens=None, initial_h=None):
    """ONNX gate order zrh; x (T,B,I), w (D,3H,I), r (D,3H,H), b (D,6H)."""
    import numpy as np
    _check_plain(ctx, ["sigmoid", "tanh"])
    if sequence_lens is not None:
        sl = np.asarray(sequence_lens)
        if sl.size and not (sl == x.shape[0]).all():
            raise NotImplementedError("per-element sequence_lens unsupported")
    hidden = int(ctx.attrs["hidden_size"])
    lbr = int(ctx.attrs.get("linear_before_reset", 0))
    clip = _clipper(ctx)
    t, bsz, _ = x.shape
    revs = _directions(ctx)
    nd = len(revs)

    def make_cell(d):
        wz, wr, wh = jnp.split(w[d], 3, axis=0)
        rz, rr, rh = jnp.split(r[d], 3, axis=0)
        if b is not None:
            bs = jnp.split(b[d], 6)
            bz, br = bs[0] + bs[3], bs[1] + bs[4]
            wbh, rbh = bs[2], bs[5]
        else:
            bz = br = wbh = rbh = 0.0

        def cell(h, xt):
            z = jax.nn.sigmoid(clip(xt @ wz.T + h @ rz.T + bz))
            rr_g = jax.nn.sigmoid(clip(xt @ wr.T + h @ rr.T + br))
            if lbr:
                hh = jnp.tanh(clip(xt @ wh.T + wbh + rr_g * (h @ rh.T + rbh)))
            else:
                hh = jnp.tanh(clip(xt @ wh.T + wbh + (rr_g * h) @ rh.T + rbh))
            h = (1 - z) * hh + z * h
            return h, h

        return cell

    cells = [make_cell(d) for d in range(nd)]
    z0 = jnp.zeros((bsz, hidden), x.dtype)
    h0 = [initial_h[d] if initial_h is not None else z0 for d in range(nd)]
    y, finals = _run_scan(cells, x, h0, revs)
    y_h = jnp.stack(finals, axis=0)
    return y, y_h
