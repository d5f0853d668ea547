"""Chunker/extraction parity tests — mirrors the reference's behavior tests
(spider/src/index.rs:159-199, spider/src/extractor.rs:66-130)."""

from __future__ import annotations

from my_crawler_spark.functions.text import (
    MAX_CHARS,
    TARGET_CHARS,
    UNBROKEN_CHARS,
    create_chunks,
    description_from_blocks,
    extract_caption_page,
    page_version,
    point_id,
    split_text,
)


def test_chunk_bounds_ascii():
    text = " ".join(["word"] * 1000)
    chunks = create_chunks([(None, text)])
    assert len(chunks) > 1
    for content, _ in chunks:
        assert len(content) <= MAX_CHARS
    # all but the last reach the target
    for content, _ in chunks[:-1]:
        assert len(content) >= TARGET_CHARS


def test_chunk_bounds_cjk_charcount():
    """char (not byte) counting — CJK-safe (index.rs:163-185)."""
    text = "漢" * 3000  # no whitespace at all
    pieces = split_text(text)
    assert all(len(p) <= MAX_CHARS for p in pieces)
    # unbroken runs split at UNBROKEN_CHARS
    assert len(pieces[0]) == UNBROKEN_CHARS


def test_unbroken_split_at_450():
    text = "x" * 2000
    pieces = split_text(text)
    assert len(pieces[0]) == UNBROKEN_CHARS


def test_split_prefers_last_whitespace():
    text = "a" * 1000 + " " + "b" * 1000
    pieces = split_text(text)
    assert pieces[0] == "a" * 1000


def test_heading_inheritance():
    blocks = [("H1", "a " * 100), (None, "b " * 100)]
    chunks = create_chunks(blocks)
    assert all(h == "H1" for _, h in chunks)


def test_empty_blocks_no_chunks():
    assert create_chunks([]) == []
    assert create_chunks([(None, "   ")]) == []


def test_description_truncation_quirk():
    blocks = ["z" * 500]
    d = description_from_blocks(blocks)
    assert d.startswith("z" * 247)
    assert d.endswith("...")
    short = description_from_blocks(["short block of twenty!!"])
    assert not short.endswith("...")
    # blocks under 20 chars are excluded (extractor.rs:41-43)
    assert description_from_blocks(["tiny"]) == ""


def test_page_version_stable_and_sensitive():
    page = extract_caption_page("https://a.com/x", "hello world " * 30)
    v1 = page["chunks"][0]["page_version"]
    again = extract_caption_page("https://a.com/x", "hello world " * 30)
    assert again["chunks"][0]["page_version"] == v1
    other = extract_caption_page("https://a.com/x", "different content " * 30)
    assert other["chunks"][0]["page_version"] != v1


def test_point_id_uuid5():
    a = point_id("https://a.com/x", "v1", 0)
    assert a == point_id("https://a.com/x", "v1", 0)
    assert a != point_id("https://a.com/x", "v1", 1)
    assert a != point_id("https://a.com/x", "v2", 0)
    import uuid

    uuid.UUID(a)  # valid uuid format


def test_empty_caption_no_chunks():
    page = extract_caption_page("https://a.com/x", "")
    assert page["chunks"] == []
    assert page["title"] == "No Title"
