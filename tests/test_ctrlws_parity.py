"""Control-character-whitespace differential sweep (20th adversarial
corpus): the text/dedup/curation family must agree with DuckDB on
documents containing the whitespace-adjacent control and Unicode space
codepoints real web text carries.

Found and fixed by this sweep when first run: Java's bare ``\\s`` is
``[ \\t\\n\\x0B\\f\\r]`` while RE2 (DuckDB) ``\\s`` is ``[ \\t\\n\\f\\r]``
— NO ``\\x0B`` — so every oracle-mirrored regex written with ``\\s``
silently diverged on VERTICAL TAB input:

- ``doc_fingerprints`` / ``dedup_normalized`` / ``cross_split_contamination``
  / ``curation_pipeline_stats``: the md5 content fingerprint normalizes
  ``\\s+ -> ' '``, so ``'a\\x0Bb'`` hashed as ``'a b'`` in Spark but as
  the raw 3-char string in DuckDB — same document, two different
  dedup identities;
- ``text_token_stats``: the BPE-ish pre-tokenizer ``\\w+|[^\\w\\s]``
  counted VT as a punctuation token in DuckDB (3 tokens for ``a\\x0Bb``)
  but not in Spark (2), and the non-space length / punct ratio split the
  same way;
- ``doc_quality_scores`` / ``perceptron_quality_classifier``: the punct
  ratio's ``[\\w\\s]`` deletion class kept VT in DuckDB, inflating the
  oracle's punctuation count (and through it the trained weights).

The fix pins the PORTABLE whitespace contract: both engines spell out
``[ \\t\\n\\x0B\\f\\r]`` (exactly Java's ASCII ``\\s``) instead of the
engine-dependent shorthand — ``operators/textfns.py::WS`` is the single
Spark-side source of truth and the oracles inline the same class. The
``test_no_bare_whitespace_shorthand_in_regexes`` guard greps the source
so a bare ``\\s`` can never creep back into an oracle-mirrored regex.

Every OTHER probed codepoint already agreed (pinned here so a Spark or
DuckDB upgrade that shifts a class gets caught): FF and CR are
whitespace in both engines; NEL U+0085, NBSP U+00A0, ZWSP U+200B,
IDEOGRAPHIC SPACE U+3000, FILE SEPARATOR U+001C are whitespace in
NEITHER engine's default (ASCII) regex classes, even though several are
Unicode whitespace — they tokenize as punctuation bytes, identically.
"""

from __future__ import annotations

import pathlib
import re

import pytest

from tests.corpus_utils import documents_table, make_sf_dir, sweep_queries
from tests.test_nulltext_parity import SWEEP_QUERIES

# The classifier consumes punct_ratio, whose class changed with the fix.
CTRLWS_QUERIES = SWEEP_QUERIES + ("perceptron_quality_classifier",)

CTRLWS_TEXTS = [
    "plain baseline text the and of",
    "vertical\x0btab between words",          # THE divergent codepoint
    "\x0bleading and trailing\x0b",
    "form\x0cfeed and carriage\rreturn mix",
    "next\x85line is not ascii whitespace",
    "no\xa0break\xa0space everywhere",
    "zero​width​space run",
    "ideographic　space　text",
    "file\x1cseparator control",
    "the quick brown fox",                    # dup-pair A: plain spaces
    "the\x0bquick\x0bbrown\x0bfox",           # dup-pair B: VT-separated —
    # with the portable class BOTH engines normalize A and B to the SAME
    # fingerprint, so the dedup family must agree they are copies
    "tab\tand newline\nand vt\x0ball three",
    "double  space\x0b\x0bdouble vt",
    "punct!\x0b?mix with, controls;",
]


@pytest.fixture(scope="module")
def ctrlws_sf_dir(tmp_path_factory) -> str:
    return make_sf_dir(
        str(tmp_path_factory.mktemp("sf_ctrlws")),
        {"documents": documents_table(CTRLWS_TEXTS)},
    )


def test_text_family_agrees_on_control_whitespace(spark, ctrlws_sf_dir):
    failures = sweep_queries(spark, ctrlws_sf_dir, CTRLWS_QUERIES)
    assert not failures, failures


def test_vt_normalizes_like_space_in_both_engines(spark, ctrlws_sf_dir):
    """The dup pair ('the quick brown fox' vs its VT-separated twin) must
    collapse to ONE normalized fingerprint — the portable-class behavior —
    in the engine AND the oracle (sweep_queries above proves they agree;
    this pins WHICH shared answer they agree on, so both engines drifting
    together to the RE2 no-VT class would still fail)."""
    from tests.oracle_utils import run_oracle
    from transit_feed_etl_spark.queries import QUERIES

    q = QUERIES["dedup_normalized"]
    rows = q.builder(spark, ctrlws_sf_dir).collect()
    copies = {r.canonical_id: r.n_copies for r in rows}
    assert copies[CTRLWS_TEXTS.index("the quick brown fox")] == 2
    oracle = run_oracle(q.oracle, ctrlws_sf_dir)
    assert 2 in set(oracle["n_copies"])


def test_no_bare_whitespace_shorthand_in_regexes():
    """Source guard: no oracle-mirrored regex may use bare ``\\s`` —
    Java and RE2 disagree on VT, so the portable class
    (``textfns.WS``) is mandatory. ``sources/formats.py`` is exempt:
    its log-line regex runs Spark-side only (no DuckDB mirror)."""
    from transit_feed_etl_spark.operators.textfns import WS

    root = pathlib.Path(__file__).resolve().parent.parent / "transit_feed_etl_spark"
    # Exempt ONLY the exact portable-class token, in both source
    # spellings (raw-string and doubled-for-SQL) — stripping it before
    # the search means a line that mixes the portable class with a
    # SEPARATE bare \s still trips the guard (ADVICE r8: the old
    # whole-line 'x0B' skip waved such lines through).
    ws_forms = (WS, WS.replace("\\", "\\\\"))
    offenders = []
    for p in sorted(root.rglob("*.py")):
        if p.name == "formats.py":
            continue
        for i, line in enumerate(p.read_text().splitlines(), 1):
            code = line.split("#", 1)[0]
            for form in ws_forms:
                code = code.replace(form, "")
            # match \s (raw-string regexes) and \\s (SQL string regexes)
            if re.search(r"\\\\?s(?![a-zA-Z])", code):
                offenders.append(f"{p.name}:{i}: {line.strip()[:80]}")
    assert not offenders, offenders
