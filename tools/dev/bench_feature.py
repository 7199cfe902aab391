#!/usr/bin/env python
"""Microbenchmark: feature-extractor layout variants on the real TPU.

Round-4 trace: FeatureNet = 13.3 ms/forward at the bench geometry
(5 views, 864x1152), of which ~10 ms is conv0/conv1's BN+ReLU elementwise
work — a layout failure: NHWC with C=8 puts 8 channels on the 128-lane
minor dim, so every elementwise pass moves 16x its logical bytes.

Variants measured here (all bf16 payloads, folded inference BN):
  nhwc         — the production path (FeatureNet graph, NHWC convs)
  conv_only    — NHWC convs with BN/ReLU removed (isolates elementwise)
  nchw         — same math, channel-first layout (W on lanes: packed
                 elementwise, but XLA must transpose around each conv)
  prefix_fused — full-res prefix (conv0,conv1,conv2+BN+ReLU) as one
                 Pallas pass, NHWC tail below half res

Timing: K steps inside one jitted lax.scan over distinct inputs with a
chained scalar (the tunnel has a ~10 ms dispatch floor and result-caches
identical dispatches).
"""

import sys
import time
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

K_STEPS = 16
VIEWS, H, W = 5, 864, 1152

LAYERS = [  # name, cout, ksize, stride
    ("conv0", 8, 3, 1),
    ("conv1", 8, 3, 1),
    ("conv2", 16, 5, 2),
    ("conv3", 16, 3, 1),
    ("conv4", 16, 3, 1),
    ("conv5", 32, 5, 2),
    ("conv6", 32, 3, 1),
    ("conv7", 32, 3, 1),
    ("conv8", 64, 5, 2),
    ("conv9", 64, 3, 1),
    ("conv10", 64, 3, 1),
]


def make_params(seed=0):
    rng = np.random.default_rng(seed)
    params = {}
    cin = 3
    for name, cout, k, _ in LAYERS:
        params[name] = {
            "w": jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.1, jnp.bfloat16),
            "scale": jnp.asarray(rng.random(cout) + 0.5, jnp.bfloat16),
            "bias": jnp.asarray(rng.standard_normal(cout) * 0.01, jnp.bfloat16),
        }
        cin = cout
    for name, i, o in [("output1", 64, 64), ("inner1", 32, 64), ("inner2", 16, 64),
                       ("output2", 64, 32), ("output3", 64, 16)]:
        params[name] = {
            "w": jnp.asarray(rng.standard_normal((i, o)) * 0.1, jnp.bfloat16),
            "b": jnp.asarray(rng.standard_normal(o) * 0.01, jnp.bfloat16),
        }
    return params


def conv_nhwc(x, p, k, stride, bn_relu=True):
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bn_relu:
        y = jnp.maximum(y * p["scale"] + p["bias"], 0)
    return y


def conv_nchw(x, p, k, stride, bn_relu=True):
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"))
    if bn_relu:
        y = jnp.maximum(y * p["scale"][:, None, None] + p["bias"][:, None, None], 0)
    return y


def fpn_tail(c4, c7, c10, params):
    """Lateral/output heads (cheap; identical across variants)."""
    def dense(x, p):
        return jnp.matmul(x, p["w"]) + p["b"]

    def up2(x):
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return x

    o3 = dense(c10, params["output1"])
    intra = up2(c10) + dense(c7, params["inner1"])
    o2 = dense(intra, params["output2"])
    intra = up2(intra) + dense(c4, params["inner2"])
    o1 = dense(intra, params["output3"])
    return o1, o2, o3


def feature_nhwc(x, params, bn_relu=True):
    acts = {}
    y = x
    for name, cout, k, s in LAYERS:
        y = conv_nhwc(y, params[name], k, s, bn_relu)
        acts[name] = y
    return fpn_tail(acts["conv4"], acts["conv7"], acts["conv10"], params)


def feature_nchw(x, params):
    acts = {}
    y = jnp.transpose(x, (0, 3, 1, 2))
    for name, cout, k, s in LAYERS:
        y = conv_nchw(y, params[name], k, s)
        acts[name] = y
    def tot(t):
        return jnp.transpose(t, (0, 2, 3, 1))
    return fpn_tail(tot(acts["conv4"]), tot(acts["conv7"]), tot(acts["conv10"]), params)


S2D_PLAN = [("conv0", 3, 1, 4), ("conv1", 3, 1, 4), ("conv2", 5, 2, 4),
            ("conv3", 3, 1, 2), ("conv4", 3, 1, 2), ("conv5", 5, 2, 2)]


def fold_params(params):
    """Pre-fold the prefix conv kernels + BN vectors (done once, outside
    the timed loop — in the model this is O(param size), not O(pixels))."""
    from patchmatchnet_tpu.ops.space_to_depth import (
        fold_channel_vector, fold_conv_kernel, folded_conv_geometry,
    )
    out = dict(params)
    for name, k, s, f_in in S2D_PLAN:
        p = params[name]
        kf, pl, ph, f_out = folded_conv_geometry(k, s, k // 2, f_in)
        out[name] = {
            "w": fold_conv_kernel(p["w"], s, k // 2, f_in),
            "scale": fold_channel_vector(p["scale"], f_out),
            "bias": fold_channel_vector(p["bias"], f_out),
        }
    return out


def feature_s2d(x, params):
    """Space-to-depth folded prefix (conv0..conv5), unfolded tail.
    Expects params already through fold_params."""
    from patchmatchnet_tpu.ops.space_to_depth import fold_image, unfold_image

    from patchmatchnet_tpu.ops.space_to_depth import folded_conv_geometry
    pads = {name: folded_conv_geometry(k, s, k // 2, f_in)[1:3]
            for name, k, s, f_in in S2D_PLAN}

    def fconv(y, name):
        p = params[name]
        pl, ph = pads[name]
        y = jax.lax.conv_general_dilated(
            y, p["w"], (1, 1), ((pl, ph), (pl, ph)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.maximum(y * p["scale"] + p["bias"], 0)

    y = fold_image(x, 4)
    y = fconv(y, "conv0")
    y = fconv(y, "conv1")
    y = fconv(y, "conv2")
    y = fconv(y, "conv3")
    c4f = fconv(y, "conv4")
    y = fconv(c4f, "conv5")
    acts = {"conv4": unfold_image(c4f, 2)}
    for name, cout, k, s in LAYERS[6:]:
        y = conv_nhwc(y, params[name], k, s, True)
        acts[name] = y
    return fpn_tail(acts["conv4"], acts["conv7"], acts["conv10"], params)


def scan_time(fn, params, xs, iters=4, label=""):
    @jax.jit
    def run(params, xs, salt):
        def body(acc, x):
            outs = fn(x, params)
            s = sum(o.ravel()[0].astype(jnp.float32) for o in jax.tree.leaves(outs))
            return acc + s, None
        acc, _ = jax.lax.scan(body, salt, xs)
        return acc

    float(run(params, xs, jnp.float32(0.0)))
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(run(params, xs, jnp.float32(i + 1.0)))
        times.append(time.perf_counter() - t0)
    floor = 0.010
    per = max(np.median(times) - floor, 1e-9) / xs.shape[0]
    print(f"  {label}: {per*1e3:.2f} ms/forward (median of {iters})")
    return per


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    params = make_params()
    xs = jax.random.uniform(
        jax.random.PRNGKey(0), (K_STEPS, VIEWS, H, W, 3), jnp.float32
    ).astype(jnp.bfloat16)
    print(f"devices: {jax.devices()}  input {xs.shape} bf16")

    if which in ("all", "nhwc"):
        scan_time(lambda x, p: feature_nhwc(x, p, True), params, xs, label="nhwc (production graph)")
    if which in ("all", "conv_only"):
        scan_time(lambda x, p: feature_nhwc(x, p, False), params, xs, label="conv_only (no BN/ReLU)")
    if which in ("all", "nchw"):
        scan_time(feature_nchw, params, xs, label="nchw (channel-first)")
    if which in ("all", "s2d"):
        # numerics check vs the NHWC graph first (f32, small shape)
        xf = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 96, 3), jnp.float32)
        pf = jax.tree.map(lambda a: a.astype(jnp.float32), params)
        with jax.default_matmul_precision("highest"):
            pff = jax.jit(fold_params)(pf)
            ref = jax.jit(lambda x, p: feature_nhwc(x, p, True))(xf, pf)
            got = jax.jit(feature_s2d)(xf, pff)
        for a, b in zip(ref, got):
            rel = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(a)))
            assert rel < 1e-5, f"s2d mismatch: rel {rel} at {a.shape}"
        print("  s2d numerics vs nhwc: OK (f32 max rel err < 1e-5)")
        pfolded = jax.jit(fold_params)(params)
        scan_time(feature_s2d, pfolded, xs, label="s2d (folded prefix, pre-folded kernels)")

    if which in ("all", "s2d_parts"):
        from patchmatchnet_tpu.ops.space_to_depth import fold_image, folded_conv_geometry
        pfolded = jax.jit(fold_params)(params)
        pads = {name: folded_conv_geometry(k, s, k // 2, f_in)[1:3]
                for name, k, s, f_in in S2D_PLAN}

        def fold_only(x, p):
            return (fold_image(x, 4),)
        scan_time(fold_only, pfolded, xs, label="fold_image(x, 4) alone")

        xs_folded = jax.jit(lambda a: jax.vmap(lambda t: fold_image(t, 4))(a))(xs)
        def folded_prefix(xf, p):
            y = xf
            for name, _, _, _ in S2D_PLAN:
                pl_, ph_ = pads[name]
                y = jax.lax.conv_general_dilated(
                    y, p[name]["w"], (1, 1), ((pl_, ph_), (pl_, ph_)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                y = jnp.maximum(y * p[name]["scale"] + p[name]["bias"], 0)
            return (y,)
        scan_time(folded_prefix, pfolded, xs_folded,
                  label="folded conv0..conv5 (input pre-folded)")

    if which in ("all", "s2d2"):
        # conv0 consumes the RAW image and emits fold-4 directly (the fold
        # fused into the layer: a 7x7 stride-4 conv), killing the 3.9 ms
        # fold_image transpose
        from patchmatchnet_tpu.ops.space_to_depth import (
            fold_channel_vector, raw_fold_conv_geometry, raw_fold_conv_kernel,
            unfold_image,
        )
        pfolded = dict(jax.jit(fold_params)(params))
        kf0, st0, pl0, ph0 = raw_fold_conv_geometry(3, 1, 1, 4)
        w0 = jax.jit(lambda w: raw_fold_conv_kernel(w, 1, 1, 4))(params["conv0"]["w"])
        sc0 = fold_channel_vector(params["conv0"]["scale"], 4)
        bi0 = fold_channel_vector(params["conv0"]["bias"], 4)
        from patchmatchnet_tpu.ops.space_to_depth import folded_conv_geometry
        pads = {name: folded_conv_geometry(k, s, k // 2, f_in)[1:3]
                for name, k, s, f_in in S2D_PLAN}

        def feature_s2d2(x, p):
            y = jax.lax.conv_general_dilated(
                x, w0, (st0, st0), ((pl0, ph0), (pl0, ph0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = jnp.maximum(y * sc0 + bi0, 0)
            for name in ("conv1", "conv2", "conv3", "conv4", "conv5"):
                pl_, ph_ = pads[name]
                y = jax.lax.conv_general_dilated(
                    y, p[name]["w"], (1, 1), ((pl_, ph_), (pl_, ph_)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                y = jnp.maximum(y * p[name]["scale"] + p[name]["bias"], 0)
                if name == "conv4":
                    c4f = y
            acts = {"conv4": unfold_image(c4f, 2)}
            for name, cout, k, s in LAYERS[6:]:
                y = conv_nhwc(y, p[name], k, s, True)
                acts[name] = y
            return fpn_tail(acts["conv4"], acts["conv7"], acts["conv10"], p)

        # numerics vs nhwc (f32)
        xf = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 96, 3), jnp.float32)
        pf = jax.tree.map(lambda a: a.astype(jnp.float32), params)
        with jax.default_matmul_precision("highest"):
            pff = dict(jax.jit(fold_params)(pf))
            w0f = jax.jit(lambda w: raw_fold_conv_kernel(w, 1, 1, 4))(pf["conv0"]["w"])
            sc0f = fold_channel_vector(pf["conv0"]["scale"], 4)
            bi0f = fold_channel_vector(pf["conv0"]["bias"], 4)
            ref = jax.jit(lambda x, p: feature_nhwc(x, p, True))(xf, pf)
            import contextlib
            saved = (w0, sc0, bi0)
            w0, sc0, bi0 = w0f, sc0f, bi0f
            got = jax.jit(feature_s2d2)(xf, pff)
            w0, sc0, bi0 = saved
        for a, b in zip(ref, got):
            rel = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(a)))
            assert rel < 1e-5, f"s2d2 mismatch: rel {rel} at {a.shape}"
        print("  s2d2 numerics vs nhwc: OK (f32 max rel err < 1e-5)")
        scan_time(feature_s2d2, pfolded, xs, label="s2d2 (raw-fold conv0 + folded prefix)")

    if which in ("all", "layers"):
        # truncated prefixes: cost deltas give per-segment attribution
        def prefix(n):
            def fn(x, p):
                y = x
                for name, cout, k, s in LAYERS[:n]:
                    y = conv_nhwc(y, p[name], k, s, True)
                return (y,)
            return fn
        prev = 0.0
        for n in range(1, len(LAYERS) + 1):
            t = scan_time(prefix(n), params, xs, label=f"prefix thru {LAYERS[n-1][0]}")
            print(f"      -> {LAYERS[n-1][0]} delta {(t - prev)*1e3:.2f} ms")
            prev = t


if __name__ == "__main__":
    main()
