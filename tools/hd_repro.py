"""Minimal on-TPU repro/validation for the hd decode kernels at WM shapes.

Round-2 failure: Mosaic "unsupported shape cast" at decode_attention_hd.py:202
(vector<112x1024xf32> -> vector<112x16x64xf32>), hit by the Sq=7 action-chunk
decode (Hkv=16, D=64, GS=7 -> N=112).
"""
import sys
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from vla_rft_tpu.ops.decode_attention_hd import (
    decode_attention_hd,
    decode_attention_shared_hd,
)


VERBOSE = "-v" in sys.argv


def run(name, fn, *args, **kw):
    try:
        out = jax.jit(lambda *a: fn(*a, **kw))(*args)
        out = np.asarray(out)
        print(f"[OK] {name}: out {out.shape} finite={np.isfinite(out).all()}")
        return True
    except Exception as e:
        if VERBOSE:
            import traceback

            traceback.print_exc()
        msg = str(e).split("\n")[0][:200]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")
        return False


def main():
    rng = np.random.default_rng(0)
    L, B, Hq, Hkv, D = 2, 16, 16, 16, 64
    HD = Hkv * D
    Sr, Sp = 640, 1152
    ok = True
    for Sq in (1, 7, 8):
        q = jnp.asarray(rng.normal(size=(B, Sq, Hq, D)), jnp.bfloat16)
        ck = jnp.asarray(rng.normal(size=(L, B, Sr, HD)), jnp.bfloat16)
        cv = jnp.asarray(rng.normal(size=(L, B, Sr, HD)), jnp.bfloat16)
        sck = jnp.asarray(rng.normal(size=(L, 2, Sp, HD)), jnp.bfloat16)
        scv = jnp.asarray(rng.normal(size=(L, 2, Sp, HD)), jnp.bfloat16)
        kv_lens = jnp.full((B,), 100, jnp.int32)
        pm = jnp.asarray([0] * 8 + [1] * 8, jnp.int32)
        ok &= run(
            f"shared bf16 Sq={Sq}", decode_attention_shared_hd,
            q, ck, cv, sck, scv, jnp.int32(0), kv_lens, pm,
            shared_valid=Sp, block_b=8,
        )
        # int8 cache
        ck8 = jnp.asarray(rng.integers(-127, 127, (L, B, Sr, HD)), jnp.int8)
        cv8 = jnp.asarray(rng.integers(-127, 127, (L, B, Sr, HD)), jnp.int8)
        sck8 = jnp.asarray(rng.integers(-127, 127, (L, 2, Sp, HD)), jnp.int8)
        scv8 = jnp.asarray(rng.integers(-127, 127, (L, 2, Sp, HD)), jnp.int8)
        sk = jnp.abs(jnp.asarray(rng.normal(size=(L, B, Hkv, Sr)), jnp.float32)) + 0.01
        sv = jnp.abs(jnp.asarray(rng.normal(size=(L, B, Hkv, Sr)), jnp.float32)) + 0.01
        ssk = jnp.abs(jnp.asarray(rng.normal(size=(L, 2, Hkv, Sp)), jnp.float32)) + 0.01
        ssv = jnp.abs(jnp.asarray(rng.normal(size=(L, 2, Hkv, Sp)), jnp.float32)) + 0.01
        ok &= run(
            f"shared int8 Sq={Sq}", decode_attention_shared_hd,
            q, ck8, cv8, sck8, scv8, jnp.int32(0), kv_lens, pm,
            shared_valid=Sp, scales=(sk, sv), shared_scales=(ssk, ssv),
            block_b=8,
        )
        ok &= run(
            f"plain bf16 Sq={Sq}", decode_attention_hd,
            q, ck, cv, jnp.int32(0), kv_lens, block_b=8,
        )
        ok &= run(
            f"plain int8 Sq={Sq}", decode_attention_hd,
            q, ck8, cv8, jnp.int32(0), kv_lens, scales=(sk, sv), block_b=8,
        )
    print("ALL OK" if ok else "FAILURES PRESENT")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
