"""AES password encryption as pure Spark expressions.

The reference encrypts the ``passwort`` column with AES-128-CBC + PKCS7
padding and emits lowercase ``hex(IV || ciphertext)``
(/root/reference/aes_pkcs7.py:49-58, /root/reference/etl.py:1206-1213). Tests
pin a fixed all-zero IV for determinism (/root/reference/etl.py:1267-1271).

Spark ≥3.4 ships ``aes_encrypt(input, key, mode, padding, iv)`` which, in CBC
mode, prepends the 16-byte IV to the ciphertext — exactly the reference's
wire format — so no UDF is needed. F6 in SURVEY.md §2.8.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FIXED_TEST_IV_HEX = "00" * 16


def aes_encrypt_hex(
    plaintext: Column, key: str | bytes, iv_hex: str | None = None
) -> Column:
    """Encrypt → lowercase hex(IV‖ciphertext); NULL-preserving.

    ``key`` is the 16-byte AES-128 key (str is utf-8 encoded). ``iv_hex``
    pins the IV (tests); None lets Spark draw a random IV per value.
    """
    key_bytes = key.encode() if isinstance(key, str) else key
    if len(key_bytes) not in (16, 24, 32):
        raise ValueError(f"AES key must be 16/24/32 bytes, got {len(key_bytes)}")
    iv = F.unhex(F.lit(iv_hex)) if iv_hex is not None else F.lit(b"")
    ct = F.aes_encrypt(
        plaintext.cast("binary"), F.lit(key_bytes), F.lit("CBC"), F.lit("PKCS"), iv
    )
    return F.lower(F.hex(ct))


def aes_decrypt_from_hex(ciphertext_hex: Column, key: str | bytes) -> Column:
    """Inverse of :func:`aes_encrypt_hex` → plaintext string."""
    key_bytes = key.encode() if isinstance(key, str) else key
    pt = F.aes_decrypt(
        F.unhex(ciphertext_hex), F.lit(key_bytes), F.lit("CBC"), F.lit("PKCS")
    )
    return pt.cast("string")
