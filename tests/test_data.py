"""MedleyMDPrompts loader tests (reference CSV schema,
MedleyMDPrompts/captions_{sources,targets}.csv)."""

from audioeditingcode_tpu.data import iter_edit_pairs, load_medley_prompts


def _write_csvs(tmp_path):
    s = tmp_path / "sources.csv"
    t = tmp_path / "targets.csv"
    s.write_text(
        "filename,source_captions\n"
        'a.wav,"A rock song."\n'
        'a.wav,"A man singing with a band."\n'
        'b.wav,"A piano piece."\n'
    )
    t.write_text(
        "filename,target_captions,can_be_used_without_source,source_caption_index\n"
        'a.wav,"A metal song.",1,1\n'
        'a.wav,"A woman singing.",0,"1,2"\n'
        'b.wav,"A harp piece.",1,1\n'
    )
    return str(s), str(t)


def test_load_and_pair(tmp_path):
    s, t = _write_csvs(tmp_path)
    sources, targets = load_medley_prompts(s, t)
    assert sources["a.wav"] == ["A rock song.", "A man singing with a band."]
    assert len(targets) == 3
    assert targets[1].source_caption_index == (1, 2)
    assert targets[0].can_be_used_without_source

    pairs = list(iter_edit_pairs(sources, targets))
    # target 0: src1 + empty; target 1: src1+src2 (no empty); target 2: src1 + empty
    assert ("a.wav", "A rock song.", "A metal song.") in pairs
    assert ("a.wav", "", "A metal song.") in pairs
    assert ("a.wav", "A man singing with a band.", "A woman singing.") in pairs
    assert ("a.wav", "", "A woman singing.") not in pairs
    assert len(pairs) == 6


def test_vendored_csvs_default_paths():
    """The CC-BY CSVs are vendored in-package: the loader works with no
    arguments and no reference checkout (107 sources / 696 targets,
    reference README.md:116-121)."""
    sources, targets = load_medley_prompts()
    assert sum(len(v) for v in sources.values()) == 107
    assert len(targets) == 696
    assert len(list(iter_edit_pairs(sources, targets))) > 696


def test_vendored_attribution_present():
    import os

    from audioeditingcode_tpu.data.medley import VENDORED_DIR

    assert os.path.exists(os.path.join(VENDORED_DIR, "LICENSE"))
    assert os.path.exists(os.path.join(VENDORED_DIR, "ATTRIBUTION.md"))
