"""Engine constants, value-parity with /root/reference/lib/constants.js:6-26."""

MAX_QUERY_CHARS = 256
MAX_QUERY_TOKENS = 20
COALESCE_PROXIMITY_RADIUS = 200  # miles
Z6_PROXIMITY_RADIUS = 1800
Z12_PROXIMITY_RADIUS = 600
Z14_PROXIMITY_RADIUS = 100
MAX_TEXT_SYNONYMS = 10
MIN_CORRECTION_LENGTH = 4
MAX_CORRECTION_LENGTH = 8
STACKABLE_LIMIT = 100
SPATIALMATCH_STACK_LIMIT = 40
VERIFYMATCH_STACK_LIMIT = 20
VERIFYMATCH_MAX_FEATURES_LIMIT = 50
MAX_CONTEXTS_LIMIT = 20
# carmen-core's cross-language grid penalty: a grid whose language set
# misses the requested (or default) language bit keeps ×0.96 of its
# relev (phrasematch.js:298-310 picks the single wanted bit; the
# promote-language acceptance's 0.982963 pin decomposes to exactly one
# 0.96-penalized cover through rebalance, and localtext pins ≤.96 for
# an out-of-language full match)
LANGUAGE_PENALTY = 0.96

# --- sharded-index layout knobs (ours, not the reference's) ---
# feature-shard modulus: features parquet is hive-partitioned by
# fshard = fid % FSHARD_MOD; a VerifyHydrate pool of of_n actors owns
# the fshard values where fshard % of_n == shard. 16 keeps local test
# layouts small; a real cluster would raise it (256+) — only the
# modulus changes, not the routing math.
FSHARD_MOD = 16
# phrase-shard modulus (matches index/build.add_bin's pshard = pbin % 64)
PSHARD_MOD = 64
