"""Known-answer vectors for the pure-Python AES / RC4 primitives.

AES vectors: FIPS-197 Appendix C (AES-128/192/256 single block) and
NIST SP 800-38A F.2 (CBC-AES128).  RC4 vectors: RFC 6229 (40-bit and
128-bit keys, first keystream bytes).
"""

from pipeline_spark.functions.purecrypto import (
    AES,
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    aes_ecb_encrypt,
    rc4,
)

PLAIN = bytes.fromhex("00112233445566778899aabbccddeeff")


def test_fips197_appendix_c():
    cases = [
        ("000102030405060708090a0b0c0d0e0f", "69c4e0d86a7b0430d8cdb78070b4c55a"),
        (
            "000102030405060708090a0b0c0d0e0f1011121314151617",
            "dda97ca4864cdfe06eaf70a0ec0d7191",
        ),
        (
            "000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f",
            "8ea2b7ca516745bfeafc49904b496089",
        ),
    ]
    for key_hex, ct_hex in cases:
        aes = AES(bytes.fromhex(key_hex))
        ct = aes.encrypt_block(PLAIN)
        assert ct.hex() == ct_hex
        assert aes.decrypt_block(ct) == PLAIN


def test_sp800_38a_cbc_aes128():
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex(
        "6bc1bee22e409f96e93d7e117393172a"
        "ae2d8a571e03ac9c9eb76fac45af8e51"
        "30c81c46a35ce411e5fbc1191a0a52ef"
        "f69f2445df4f9b17ad2b417be66c3710"
    )
    ct = bytes.fromhex(
        "7649abac8119b246cee98e9b12e9197d"
        "5086cb9b507219ee95db113a917678b2"
        "73bed6b8e3c1743b7116e69e22229516"
        "3ff1caa1681fac09120eca307586e1a7"
    )
    assert aes_cbc_encrypt(key, iv, pt) == ct
    assert aes_cbc_decrypt(key, iv, ct) == pt


def test_ecb_multiblock():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    two = PLAIN * 2
    ct = aes_ecb_encrypt(key, two)
    assert ct[:16] == ct[16:]  # ECB leaks equality — that's the point of the test
    aes = AES(key)
    assert aes.decrypt_block(ct[:16]) == PLAIN


def test_rc4_rfc6229():
    # RFC 6229: key 0x0102030405, keystream offset 0
    ks = rc4(bytes.fromhex("0102030405"), bytes(16))
    assert ks.hex() == "b2396305f03dc027ccc3524a0a1118a8"
    # key 0x0102...10 (128-bit)
    ks = rc4(bytes.fromhex("0102030405060708090a0b0c0d0e0f10"), bytes(16))
    assert ks.hex() == "9ac7cc9a609d1ef7b2932899cde41b97"
    # symmetry
    msg = b"attack at dawn!!"
    assert rc4(b"k3y", rc4(b"k3y", msg)) == msg
