"""Guard the remaining generate_series bounds inside DuckDB oracles.

ADVICE r9 flagged the silent-cap class: an oracle that extracts
n-grams via ``generate_series(1, K)`` silently drops n-grams past K
and parity diverges only when a fixture grows. The r10 oracles use
the uncapped range/list_transform/unnest pattern; the established
green oracles keep their caps (4000 token positions in the LM/dedup
tier, 512 span positions, 200 per-word symbol positions in BPE) —
and THIS test machine-enforces the advice's alternative: the fixture
sizes at every scale an oracle actually runs at (sf0.001 parity,
sf0.01 driver) must stay comfortably under each cap. If the driver
ever regenerates bigger fixtures, this fails before any oracle
silently truncates."""

import duckdb
import pytest

# cap -> the quantity it bounds
TOKEN_CAPS = [512, 4000]   # per-document token positions
WORD_CAP = 200             # per-word character/symbol positions

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_fixture_token_counts_under_series_caps(sf_dir):
    row = duckdb.sql(
        f"""
        SELECT
          max(len(string_split_regex(trim(text), '\\s+'))) AS max_tokens,
          max(len(text)) AS max_chars
        FROM read_parquet('{sf_dir}/documents.parquet')
        """
    ).fetchone()
    max_tokens, max_chars = row
    for cap in TOKEN_CAPS:
        assert max_tokens < cap // 2, (
            f"{sf_dir}: {max_tokens} tokens is within 2x of the "
            f"oracle series cap {cap} — migrate the remaining capped "
            f"oracles to the range/list_transform pattern"
        )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_fixture_word_lengths_under_bpe_cap(sf_dir):
    (max_word,) = duckdb.sql(
        f"""
        SELECT max(len(w)) FROM (
          SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
          FROM read_parquet('{sf_dir}/documents.parquet'))
        """
    ).fetchone()
    assert max_word < WORD_CAP // 2, (
        f"{sf_dir}: a {max_word}-char word is within 2x of the BPE "
        f"oracle's {WORD_CAP}-position cap"
    )
