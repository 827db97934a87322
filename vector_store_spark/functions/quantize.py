"""Quantization functions (SURVEY.md §2.7 F3, §1.4): f32→f16/bf16/i8 scalar
quantization and B1 sign binarization with bit-packing, plus Hamming distance
over packed binary — reference semantics from vs_index/usearch.rs:503-513
(scalar kinds) and :1179-1205 (B1 sign>0 bit-pack, MSB-first within byte).

Storage quantization on Spark: the quantized representation is a *column*
(smaller parquet, cheaper shuffles); search either scores the quantized
column directly (B1/Hamming, i8 dot) or rescores quantized candidates against
the full-precision column (the reference's `rescoring=true` CQL option,
crates/validator/src/quantization_and_rescoring.rs).

All of these are built-in Catalyst expressions except the f16 round-trip,
which needs IEEE half-precision rounding (numpy, Arrow-batched).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

from vector_store_spark.types import Quantization


def _col(c):
    return F.col(c) if isinstance(c, str) else c


def quantize_i8(vec: Column | str) -> Column:
    """Symmetric int8: clamp(round(x·127), ±127) — assumes inputs in [-1, 1]
    (cosine-normalized embeddings), matching USearch's i8 convention."""
    return F.transform(
        _col(vec),
        lambda x: F.greatest(
            F.lit(-127), F.least(F.lit(127), F.round(x.cast("double") * 127).cast("int"))
        ).cast("tinyint"),
    )


def dequantize_i8(vec: Column | str) -> Column:
    return F.transform(_col(vec), lambda x: x.cast("double") / F.lit(127.0))


def quantize_f16_udf():
    """IEEE binary16 round-trip (value semantics of storing f16): f64 → f16 →
    f64. Arrow-batched numpy — Catalyst has no half type."""
    import pandas as pd

    def batch(vecs):
        import numpy as np

        return pd.Series(
            [
                None if v is None
                else np.asarray(v, dtype=np.float64).astype(np.float16).astype(np.float64).tolist()
                for v in vecs
            ]
        )

    return F.pandas_udf(batch, ArrayType(DoubleType())).asNondeterministic()


def quantize_bf16_udf():
    """bfloat16 round-trip via numpy bit masking (truncation, like USearch)."""
    import pandas as pd

    def batch(vecs):
        import numpy as np

        out = []
        for v in vecs:
            if v is None:
                out.append(None)
                continue
            f32 = np.asarray(v, dtype=np.float32)
            bits = f32.view(np.uint32) & np.uint32(0xFFFF0000)
            out.append(bits.view(np.float32).astype(np.float64).tolist())
        return pd.Series(out)

    return F.pandas_udf(batch, ArrayType(DoubleType())).asNondeterministic()


def b1_pack(vec: Column | str) -> Column:
    """Sign-binarize (x > 0 ⇒ 1) and pack MSB-first into bytes
    (usearch.rs:1179-1205), as array<int> of byte values 0-255 (unsigned bytes
    do not fit tinyint). Pure Catalyst:
    group indices by 8, fold bits."""
    v = _col(vec)
    n_bytes = F.ceil(F.size(v) / 8).cast("int")
    byte_idx = F.sequence(F.lit(0), n_bytes - 1)

    def pack_byte(bi: Column) -> Column:
        # bit j (MSB-first) = element at bi*8 + j; try_element_at: the last
        # byte's padding reads past the array and must yield 0-bits, and ANSI
        # mode (Spark 4 default) makes plain element_at throw there
        byte = F.lit(0)
        for j in range(8):
            elem = F.try_element_at(v, (bi * 8 + j + 1).cast("int"))
            bit = F.when(elem > 0, F.lit(1)).otherwise(F.lit(0))
            byte = byte * 2 + F.when(elem.isNull(), F.lit(0)).otherwise(bit)
        return byte

    return F.when(F.size(v) == 0, F.array().cast("array<int>")).otherwise(
        F.transform(byte_idx, pack_byte)
    )


def hamming_packed(a: Column | str, b: Column | str) -> Column:
    """Hamming distance between two b1-packed byte arrays: Σ popcount(xor)."""
    a, b = _col(a), _col(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("double")


def hamming_b1_udf(query: list[float]):
    """Arrow twin of ``hamming_packed(b1_pack(vec), b1_pack(query))``: NumPy
    packbits + XOR + popcount per Arrow batch, computing the identical integer
    distance as the b1_pack/hamming_packed Column expressions (the executable
    spec, interpreted as CodegenFallback). Cross-validated in tests."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType

    qbits = np.packbits(np.asarray(query, dtype=np.float64) > 0)  # MSB-first
    popcount = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1)

    def batch(vecs):
        out = np.empty(len(vecs), dtype=np.float64)
        for i, v in enumerate(vecs):
            vbits = np.packbits(np.asarray(v, dtype=np.float64) > 0)
            out[i] = popcount[np.bitwise_xor(vbits, qbits)].sum()
        return pd.Series(out)

    return F.pandas_udf(batch, DoubleType()).asNondeterministic()
