"""Run Pallas kernels compiled on the real TPU and compare vs dense/XLA."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from qwen3_asr_rs_tpu.ops.attention import dense_attention, MASK_VALUE
    from qwen3_asr_rs_tpu.ops.pallas.flash_attention import flash_attention
    from qwen3_asr_rs_tpu.ops.pallas.quant_matmul import (
        dequantize, quant_matmul, quantize_weight,
    )

    print("backend:", jax.default_backend(), file=sys.stderr)
    rng = np.random.default_rng(0)

    # flash attention: prefill-like GQA causal + validity
    b, sq, sk, hq, hkv, d = 1, 448, 448, 16, 8, 128
    q = jnp.asarray(rng.standard_normal((b, sq, hq, d)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, sk, hkv, d)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, sk, hkv, d)) * 0.3, jnp.bfloat16)
    valid = jnp.asarray([430], jnp.int32)
    out = flash_attention(q, k, v, valid, causal=True)
    i = np.arange(sq)[:, None]
    j = np.arange(sk)[None, :]
    mask = np.where(j <= i, 0.0, MASK_VALUE) + np.where(j < 430, 0.0,
                                                        MASK_VALUE)
    ref = dense_attention(q, k, v, mask=jnp.asarray(mask, jnp.float32)[None,
                                                                       None])
    got, want = np.asarray(out, np.float32), np.asarray(ref, np.float32)
    err = np.max(np.abs(got[:, :430] - want[:, :430]))
    print(f"flash max err vs dense (bf16): {err:.5f}")
    assert err < 0.05, "flash kernel mismatch on TPU"

    # quant matmul
    x = jnp.asarray(rng.standard_normal((8, 1024)) * 0.3, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((1024, 2048)) * 0.02, jnp.float32)
    w_q, s = quantize_weight(w)
    y = quant_matmul(x, w_q, s, out_dtype=jnp.float32)
    y_ref = x.astype(jnp.float32) @ dequantize(w_q, s)
    qerr = np.max(np.abs(np.asarray(y) - np.asarray(y_ref)))
    print(f"quant_matmul max err: {qerr:.5f}")
    assert qerr < 0.05, "quant matmul mismatch on TPU"

    # quant matmul with K not a block multiple (exercises the overhang
    # masking — unmasked this dotted unspecified memory)
    x2 = jnp.asarray(rng.standard_normal((8, 1000)) * 0.3, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((1000, 1024)) * 0.02, jnp.float32)
    w2_q, s2 = quantize_weight(w2)
    y2 = quant_matmul(x2, w2_q, s2, block_in=512, out_dtype=jnp.float32)
    y2_ref = x2.astype(jnp.float32) @ dequantize(w2_q, s2)
    q2err = np.max(np.abs(np.asarray(y2) - np.asarray(y2_ref)))
    print(f"quant_matmul (K%block!=0) max err: {q2err:.5f}")
    assert np.isfinite(np.asarray(y2)).all(), "overhang poisoned output"
    assert q2err < 0.05, "quant matmul overhang mismatch on TPU"

    # decode attention (grid variant) with a right-aligned live range
    # (exercises the leading-dead-block clamp)
    from qwen3_asr_rs_tpu.ops.pallas.decode_attention import (
        decode_attention,
    )

    B, Hkv, S, D = 1, 8, 1024, 128
    ks = jnp.asarray(rng.standard_normal((B, Hkv, S, D)) * 0.3,
                     jnp.bfloat16)
    vs = jnp.asarray(rng.standard_normal((B, Hkv, S, D)) * 0.3,
                     jnp.bfloat16)
    qd = jnp.asarray(rng.standard_normal((B, 16, D)) * 0.3, jnp.bfloat16)
    kf = jnp.asarray(rng.standard_normal((B, Hkv, D)) * 0.3, jnp.bfloat16)
    vf = jnp.asarray(rng.standard_normal((B, Hkv, D)) * 0.3, jnp.bfloat16)
    start = jnp.asarray([700], jnp.int32)
    end = jnp.asarray([900], jnp.int32)
    out_d = decode_attention(qd, ks, vs, kf, vf, start, end, block_s=256)
    assert np.isfinite(np.asarray(out_d, np.float32)).all()
    print("decode_attention right-aligned OK")

    # decode attention (manual-DMA variant) with a slab whose size is
    # 8-aligned but NOT a block multiple, and a live range reaching the
    # slab end — the last block's DMA start clamps to s_max - block_s,
    # which must be expressible as a provable multiple of 8 (the raw
    # minimum() form failed Mosaic's divisibility prover at 1.7B
    # batch-8: round-4 fix). Checked against the dense reference.
    from qwen3_asr_rs_tpu.ops.pallas.decode_attention import (
        decode_attention_dma,
    )

    L, B2, S2 = 2, 8, 568  # 568 % 128 != 0, 568 % 8 == 0
    ks2 = jnp.asarray(
        rng.standard_normal((L, B2, Hkv, S2, D)) * 0.3, jnp.bfloat16
    )
    vs2 = jnp.asarray(
        rng.standard_normal((L, B2, Hkv, S2, D)) * 0.3, jnp.bfloat16
    )
    q2d = jnp.asarray(rng.standard_normal((B2, 16, D)) * 0.3, jnp.bfloat16)
    kf2 = jnp.asarray(rng.standard_normal((B2, Hkv, D)) * 0.3, jnp.bfloat16)
    vf2 = jnp.asarray(rng.standard_normal((B2, Hkv, D)) * 0.3, jnp.bfloat16)
    end2 = jnp.asarray([S2] * B2, jnp.int32)  # live to the slab end
    out_dma = decode_attention_dma(
        q2d, ks2, vs2, kf2, vf2, jnp.int32(1), None, end2, block_s=128
    )
    # dense reference over layer 1's full slab + the self term
    kd = jnp.concatenate(
        [ks2[1].astype(jnp.float32), kf2.astype(jnp.float32)[:, :, None]],
        axis=2,
    )
    vd = jnp.concatenate(
        [vs2[1].astype(jnp.float32), vf2.astype(jnp.float32)[:, :, None]],
        axis=2,
    )
    qg = q2d.astype(jnp.float32).reshape(B2, Hkv, 2, D)
    sc_d = jnp.einsum("bhgd,bhkd->bhgk", qg, kd) * D ** -0.5
    p_d = jax.nn.softmax(sc_d, axis=-1)
    ref_dma = jnp.einsum("bhgk,bhkd->bhgd", p_d, vd).reshape(B2, 16, D)
    dma_err = np.max(
        np.abs(np.asarray(out_dma, np.float32) - np.asarray(ref_dma))
    )
    print(f"decode_attention_dma clamped last block err: {dma_err:.5f}")
    assert dma_err < 0.05, "DMA decode attention mismatch on TPU"

    # int8-KV DMA path (round 5): per-slot scale slabs ride their own
    # double-buffered DMA and dequantize in VMEM. Slabs 128-aligned
    # (scale slices are LANE slices), live range ends mid-block so the
    # clamp + mask engage, start mid-slab so leading dead blocks skip.
    from qwen3_asr_rs_tpu.models.text_decoder import quantize_kv

    S3 = 640
    k3f = rng.standard_normal((L, B2, Hkv, S3, D)).astype(np.float32) * 0.3
    v3f = rng.standard_normal((L, B2, Hkv, S3, D)).astype(np.float32) * 0.3
    kq3, ksc3 = quantize_kv(jnp.asarray(k3f))
    vq3, vsc3 = quantize_kv(jnp.asarray(v3f))
    start3 = jnp.asarray([0, 37] * (B2 // 2), jnp.int32)
    end3 = jnp.asarray([450, 600] * (B2 // 2), jnp.int32)
    out_q = decode_attention_dma(
        q2d, kq3, vq3, kf2, vf2, jnp.int32(1), start3, end3,
        k_scales=ksc3, v_scales=vsc3, block_s=256,
    )
    # dense reference on the dequantized layer-1 slab
    k_deq = np.asarray(kq3[1], np.float32) * np.asarray(ksc3[1])[..., None]
    v_deq = np.asarray(vq3[1], np.float32) * np.asarray(vsc3[1])[..., None]
    live = (
        (np.arange(S3)[None, :] >= np.asarray(start3)[:, None])
        & (np.arange(S3)[None, :] < np.asarray(end3)[:, None])
    )  # (B, S)
    kd3 = jnp.concatenate(
        [jnp.asarray(k_deq), kf2.astype(jnp.float32)[:, :, None]], axis=2
    )
    vd3 = jnp.concatenate(
        [jnp.asarray(v_deq), vf2.astype(jnp.float32)[:, :, None]], axis=2
    )
    sc_q = jnp.einsum(
        "bhgd,bhkd->bhgk",
        q2d.astype(jnp.float32).reshape(B2, Hkv, 2, D), kd3
    ) * D ** -0.5
    mask = np.concatenate([live, np.ones((B2, 1), bool)], axis=1)
    sc_q = jnp.where(mask[:, None, None, :], sc_q, -1e9)
    p_q = jax.nn.softmax(sc_q, axis=-1)
    ref_q = jnp.einsum("bhgk,bhkd->bhgd", p_q, vd3).reshape(B2, 16, D)
    q_err = np.max(
        np.abs(np.asarray(out_q, np.float32) - np.asarray(ref_q))
    )
    print(f"decode_attention_dma int8-KV err: {q_err:.5f}")
    assert q_err < 0.05, "int8-KV DMA decode attention mismatch on TPU"
    print("TPU kernel check OK")


if __name__ == "__main__":
    main()
