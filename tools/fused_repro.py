"""On-TPU compile/run check for the fused decode-layer kernels at WM shapes."""
import sys
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from vla_rft_tpu.ops.fused_decode_layer import (
    fused_o_mlp,
    fused_rmsnorm_qkv,
    rope_tables,
)


def run(name, fn, *args, **kw):
    try:
        out = jax.jit(lambda *a: fn(*a, **kw))(*args)
        outs = jax.tree.leaves(out)
        outs = [np.asarray(o) for o in outs]
        fin = all(np.isfinite(o.astype(np.float32)).all() for o in outs)
        print(f"[OK] {name}: {[o.shape for o in outs]} finite={fin}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:300]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")
        return False


def main():
    rng = np.random.default_rng(0)
    L, H, Hq, Hkv, D, I = 2, 1024, 16, 16, 64, 4096
    HqD, KD = Hq * D, Hkv * D
    ok = True
    for B, Sq in ((128, 1), (64, 7), (64, 8)):
        x = jnp.asarray(rng.normal(size=(B, Sq, H)), jnp.bfloat16)
        pos = jnp.asarray(rng.integers(0, 1600, (B, Sq)), jnp.int32)
        nw = jnp.asarray(rng.normal(size=(L, H)), jnp.bfloat16)
        wq = jnp.asarray(rng.integers(-127, 127, (L, H, HqD)), jnp.int8)
        sq = jnp.abs(jnp.asarray(rng.normal(size=(L, HqD)), jnp.bfloat16)) + 0.01
        wk = jnp.asarray(rng.integers(-127, 127, (L, H, KD)), jnp.int8)
        sk = jnp.abs(jnp.asarray(rng.normal(size=(L, KD)), jnp.bfloat16)) + 0.01
        wv = jnp.asarray(rng.integers(-127, 127, (L, H, KD)), jnp.int8)
        sv = jnp.abs(jnp.asarray(rng.normal(size=(L, KD)), jnp.bfloat16)) + 0.01
        cos, sins = rope_tables(pos, 10000.0, Hq, D)
        ok &= run(
            f"qkv B={B} Sq={Sq}", fused_rmsnorm_qkv,
            x, cos, sins, jnp.int32(0), nw, wq, sq, wk, sk, wv, sv,
            num_heads=Hq, num_kv_heads=Hkv, head_dim=D, eps=1e-6,
        )
        attn = jnp.asarray(rng.normal(size=(B, Sq, HqD)), jnp.bfloat16)
        wo = jnp.asarray(rng.integers(-127, 127, (L, HqD, H)), jnp.int8)
        so = jnp.abs(jnp.asarray(rng.normal(size=(L, H)), jnp.bfloat16)) + 0.01
        wg = jnp.asarray(rng.integers(-127, 127, (L, H, I)), jnp.int8)
        sg = jnp.abs(jnp.asarray(rng.normal(size=(L, I)), jnp.bfloat16)) + 0.01
        wu = jnp.asarray(rng.integers(-127, 127, (L, H, I)), jnp.int8)
        su = jnp.abs(jnp.asarray(rng.normal(size=(L, I)), jnp.bfloat16)) + 0.01
        wd = jnp.asarray(rng.integers(-127, 127, (L, I, H)), jnp.int8)
        sd = jnp.abs(jnp.asarray(rng.normal(size=(L, H)), jnp.bfloat16)) + 0.01
        ok &= run(
            f"o_mlp B={B} Sq={Sq}", fused_o_mlp,
            attn, x, jnp.int32(0), wo, so, nw, wg, sg, wu, su, wd, sd,
            eps=1e-6,
        )
    print("ALL OK" if ok else "FAILURES PRESENT")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
