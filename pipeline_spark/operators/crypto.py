"""`crypto` transform: field-level AES encrypt/decrypt.

Reference: module/transform/CryptoTransform.java:45-641 (legacy) — field
encryption with keys from Vault/KMS/GCS.  Spark-first: the JVM builtins
``aes_encrypt``/``aes_decrypt`` (GCM/CBC/ECB), key supplied inline
(base64) or via a local file; remote key providers are environment
integrations left to deployment.
"""

from __future__ import annotations

import base64

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module


def _load_key(p: dict) -> bytes:
    if p.get("key"):
        return base64.b64decode(p["key"])
    if p.get("keyFile"):
        with open(p["keyFile"], "rb") as f:
            return f.read()
    raise ValueError("crypto requires key (base64) or keyFile")


def _redact_in_plans(spark, key: bytes) -> None:
    import re as _re

    pats = [f"(?i){key.hex()}", _re.escape(base64.b64encode(key).decode())]
    existing = spark.conf.get("spark.sql.redaction.string.regex", None)
    merged = "|".join(([existing] if existing else []) + pats)
    spark.conf.set("spark.sql.redaction.string.regex", merged)


@module("crypto", kind=KIND_TRANSFORM)
def crypto_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    p = ctx.params
    df = ctx.input
    mode = str(p.get("mode", "encrypt")).lower()
    fields = p.get("fields") or [p.get("field")]
    aes_mode = str(p.get("aesMode", "GCM")).upper()
    key = _load_key(p)

    # key passed as a bound Column (F.col handles names needing backticks),
    # and its literal renderings (hex / base64) are registered with Spark's
    # string redaction so the key never appears in explain plans, the Spark
    # UI SQL tab, or event logs — any literal (string or binary) would
    # otherwise print there verbatim
    _redact_in_plans(ctx.spark, key)
    key_col = F.lit(key)
    for field in fields:
        col = F.col(field)
        if mode == "encrypt":
            enc = F.aes_encrypt(col.cast("string"), key_col, F.lit(aes_mode))
            df = df.withColumn(field, F.base64(enc))
        elif mode == "decrypt":
            dec = F.aes_decrypt(F.unbase64(col), key_col, F.lit(aes_mode))
            df = df.withColumn(field, dec.cast("string"))
        else:
            raise ValueError(f"crypto: unknown mode '{mode}'")
    return {"": df}
