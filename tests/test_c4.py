"""C4 structural cleaning (operators/c4.py) vs an independent
in-test Python implementation of the Raffel et al. 2020 §2.2 rules."""

from __future__ import annotations

import re

import pytest

from strategicai_visibility_loop_etl_spark.operators.c4 import (
    c4_quality_filter,
    synth_pages,
)

PAGES = {
    1: (  # clean page: all lines survive, plenty of sentences
        "The quick brown fox jumps over the lazy dog.\n"
        "A second sentence with enough words here!\n"
        "And a third one to clear the bar?\n"
        'He said "this line ends with a quote."'
    ),
    2: (  # line-level drops only -> too few sentences
        "no terminal punctuation on this line\n"
        "Too short.\n"
        "Please enable JavaScript to continue reading this."
    ),
    3: "Lorem Ipsum dolor sit amet is boilerplate filler text.",
    4: "var config = {a: 1}; real sentences follow here anyway.",
    5: (  # bad word present (word-boundary, case-insensitive)
        "This page mentions BadToken right in the middle.\n"
        "Another perfectly fine sentence sits here too.\n"
        "And one more to get past three sentences."
    ),
    6: "",  # empty page
    7: (  # badtoken only as substring of a longer word -> NOT a match
        "The word badtokenize is not the policy word itself.\n"
        "Another perfectly fine sentence sits right here.\n"
        "A third sentence closes out this clean page."
    ),
    8: (  # sentence counting: multiple terminal marks on kept lines
        "One. Two. Three sentences all on one kept line.\n"
        "  surrounded by whitespace and still kept here.  \n"
        "dropped line with no terminal punctuation at all"
    ),
}


def py_c4(text, min_words=5, min_sents=3, bad_words=("badtoken",)):
    lines = [l.strip() for l in text.split("\n")]
    lines = [l for l in lines if l]
    kept = [
        l
        for l in lines
        if re.search(r'[.!?"]$', l)
        and len(l.split()) >= min_words
        and "javascript" not in l.lower()
    ]
    n_sents = sum(len(re.findall(r"[.!?]", l)) for l in kept)
    low = text.lower()
    if "lorem ipsum" in low:
        reason = "lorem_ipsum"
    elif "{" in text:
        reason = "brace"
    elif re.search(
        r"(?:^|\s)(?:" + "|".join(bad_words) + r")[.!?]*(?:\s|$)", low
    ):
        reason = "bad_words"
    elif n_sents < min_sents:
        reason = "too_few_sentences"
    else:
        reason = None
    return {
        "kept": reason is None,
        "drop_reason": reason,
        "n_lines": len(lines),
        "n_lines_kept": len(kept),
        "n_sentences": n_sents,
        "clean_text": "\n".join(kept) if reason is None else None,
    }


def test_c4_matches_python_reference(spark):
    df = spark.createDataFrame(list(PAGES.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in c4_quality_filter(df, bad_words=("badtoken",)).collect()
    }
    assert set(got) == set(PAGES)
    for i, text in PAGES.items():
        want = py_c4(text)
        have = {k: got[i][k] for k in want}
        assert have == want, (i, have, want)
    # spot-check the semantics the reference encodes
    assert got[1]["kept"] and got[1]["n_lines_kept"] == 4
    assert got[2]["drop_reason"] == "too_few_sentences"
    assert got[2]["n_lines_kept"] == 0  # punct / words / javascript each drop one
    assert got[3]["drop_reason"] == "lorem_ipsum"
    assert got[4]["drop_reason"] == "brace"
    assert got[5]["drop_reason"] == "bad_words"
    assert got[6] == dict(
        doc_id=6, kept=False, drop_reason="too_few_sentences",
        n_lines=0, n_lines_kept=0, n_sentences=0, clean_text=None,
    )
    assert got[7]["kept"]  # substring of a longer word is not a policy hit
    assert got[8]["n_sentences"] == 4 and got[8]["n_lines_kept"] == 2


def test_c4_null_text_passes_through(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    row = c4_quality_filter(df).collect()[0]
    assert not row["kept"] and row["drop_reason"] == "too_few_sentences"
    assert row["n_lines"] == 0


def test_synth_pages_deterministic_and_rule_covering(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {r["doc_id"]: r["page"] for r in synth_pages(docs).collect()}
    b = {r["doc_id"]: r["page"] for r in synth_pages(docs).collect()}
    assert a == b  # purely deterministic, no rand()
    out = c4_quality_filter(
        synth_pages(docs), text_col="page", bad_words=("badtoken",)
    )
    reasons = {r["drop_reason"] for r in out.collect()}
    # the scaffolding must exercise every page-level rule + keeps
    assert reasons == {
        None, "lorem_ipsum", "brace", "bad_words", "too_few_sentences"
    }


def test_dedup_lines_within_doc(spark):
    from strategicai_visibility_loop_etl_spark.operators.textprep import (
        dedup_lines_within_doc,
    )

    pages = [
        (1, "nav home about\nArticle body one.\nnav home about\nFooter (c).\n  nav home about  "),
        (2, "unique one\nunique two\nunique three"),
        (3, ""),
        (4, None),
        (5, "same\nsame\nsame\nsame"),
    ]
    df = spark.createDataFrame(pages, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in dedup_lines_within_doc(df).collect()}
    # doc 1: 5 trimmed lines, boilerplate repeats 3x -> keep first only
    assert got[1]["n_lines"] == 5 and got[1]["n_kept"] == 3
    assert got[1]["text"] == "nav home about\nArticle body one.\nFooter (c)."
    assert got[1]["dup_line_fraction"] == 0.4
    # doc 2: untouched, order preserved
    assert got[2]["n_removed"] == 0 and got[2]["text"] == pages[1][1]
    # empty / null docs: zero lines, fraction 0.0, empty text
    for i in (3, 4):
        assert got[i] == dict(
            doc_id=i, n_lines=0, n_kept=0, n_removed=0,
            dup_line_fraction=0.0, text="",
        )
    # doc 5: all-identical lines collapse to one
    assert got[5]["n_kept"] == 1 and got[5]["dup_line_fraction"] == 0.75


def test_boilerplate_line_excision(spark):
    from strategicai_visibility_loop_etl_spark.operators.dedup import (
        boilerplate_line_excision,
    )

    pages = [
        (1, "COOKIE BANNER accept all\nUnique article one.\nFooter (c) corp"),
        (2, "COOKIE BANNER accept all\nUnique article two.\nFooter (c) corp"),
        (3, "Unique article three.\nFooter (c) corp"),
        (4, "repeated inside\nrepeated inside\nUnique article four."),  # df=1
        (5, ""),
        (6, None),
    ]
    df = spark.createDataFrame(pages, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in boilerplate_line_excision(df, min_df=2).collect()
    }
    # banner (df=2) and footer (df=3) excised everywhere
    assert got[1]["clean_text"] == "Unique article one."
    assert got[2]["clean_text"] == "Unique article two."
    assert got[3]["clean_text"] == "Unique article three."
    assert got[1]["n_removed"] == 2 and got[3]["n_removed"] == 1
    # within-doc repetition alone is NOT boilerplate (df counts docs)
    assert got[4]["n_removed"] == 0
    assert got[4]["clean_text"].count("repeated inside") == 2
    # empty / null pages pass through
    for i in (5, 6):
        assert got[i] == dict(
            doc_id=i, n_lines=0, n_removed=0, clean_text="",
        )


def test_boilerplate_line_excision_min_df(spark):
    from strategicai_visibility_loop_etl_spark.operators.dedup import (
        boilerplate_line_excision,
    )

    df = spark.createDataFrame(
        [(1, "shared line here\nown one."), (2, "shared line here\nown two."),
         (3, "shared line here\nown three.")],
        "doc_id long, text string",
    )
    # min_df=4 > corpus df -> nothing excised
    got = boilerplate_line_excision(df, min_df=4).collect()
    assert all(r["n_removed"] == 0 for r in got)
