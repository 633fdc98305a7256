"""Engine-portable deterministic hashing for the text/dedup family.

Every hash here is computable bit-identically in Spark SQL and in DuckDB
(the correctness oracle), so LSH bucket assignments, MinHash signatures and
SimHash bits match exactly across engines:

    h60(s)  = first 15 hex chars of md5(s) as a 60-bit non-negative BIGINT
              Spark : conv(substr(md5(s), 1, 15), 16, 10)  cast long
              DuckDB: CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)

MinHash permutations are universal-hash style ``(a*x + b) mod P`` with
P = 2^31 - 1 (Mersenne prime); ``x = h60 mod P`` keeps every product
within signed-64 range (a < 2^31, x < 2^31 => a*x < 2^62).

Scale note: all signature computation is per-row array math
(``transform``/``array_min`` — whole-stage codegen, zero shuffle); the only
shuffles in the dedup pipeline are the LSH band bucket-join and the
candidate-pair verify join, which is the textbook distributed MinHash plan.
"""

from __future__ import annotations

MERSENNE = 2_147_483_647  # 2^31 - 1

# (a, b) pairs for the universal-hash permutations; fixed odd constants so
# any engine / executor / round regenerates identical signatures.
PERM_A = [
    1_203_114_875, 1_150_766_481, 1_751_205_499, 846_561_836,
    1_616_043_852, 1_097_742_880, 633_810_936, 2_038_813_175,
    873_422_326, 1_253_629_413, 1_782_356_729, 715_228_907,
    1_437_921_523, 982_113_341, 1_921_882_217, 557_713_459,
]
PERM_B = [
    1_997_032_385, 1_628_191_807, 1_293_395_417, 2_002_475_849,
    715_711_665, 1_329_389_171, 169_571_377, 1_319_878_897,
    1_946_705_589, 442_562_011, 809_543_213, 1_676_221_861,
    123_456_791, 987_654_323, 192_837_465, 1_029_384_757,
]
N_PERMS = 16
LSH_BANDS = 4          # 16 signatures = 4 bands x 4 rows
LSH_ROWS_PER_BAND = 4

# 60-bit SimHash (matches the h60 token-hash width; bit 59 < sign bit, so
# signatures stay non-negative BIGINT in both engines).  Round-2 verdict:
# 32-bit signatures gave 8-bit chunk keys = only 256 bucket values per chunk,
# so intra-bucket candidate pairs grew ~4N^2/256 — a quadratic wall at crawl
# scale.  4 x 15-bit chunks give 32768 bucket values per chunk (128x more
# selective) while the pigeonhole argument for max_hamming=3 is unchanged
# (4 chunks, <=3 flipped bits => some chunk has zero flips).
SIMHASH_BITS = 60
SIMHASH_CHUNKS = 4     # 4 chunks x 15 bits for hamming-ball candidate bands


def spark_h60(expr: str) -> str:
    """Spark SQL snippet: 60-bit md5-prefix hash of a string expression."""
    return f"cast(conv(substring(md5({expr}), 1, 15), 16, 10) as bigint)"


def duck_h60(expr: str) -> str:
    """DuckDB SQL snippet computing the identical 60-bit hash."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"
