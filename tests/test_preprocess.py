import numpy as np

from llm_speech_summarization_tpu.data.preprocess import (
    ctc_collapse_with_offsets,
    get_ctc_pool_ranges,
    word_offsets_from_ctc,
)


def test_ctc_collapse():
    # blank=0: [0,3,3,0,5,5,5,0,0,3] → (3,1,3), (5,4,7), (3,9,10)
    pred = np.array([0, 3, 3, 0, 5, 5, 5, 0, 0, 3])
    got = ctc_collapse_with_offsets(pred, blank_id=0)
    assert got == [(3, 1, 3), (5, 4, 7), (3, 9, 10)]


def test_word_offsets():
    # delim=4: tokens h(1) i(2) | w(3)
    pred = np.array([1, 1, 0, 2, 4, 4, 3, 3, 0])
    words = word_offsets_from_ctc(pred, blank_id=0, word_delim_id=4)
    assert words == [
        {"start_offset": 0, "end_offset": 4},
        {"start_offset": 6, "end_offset": 8},
    ]


def _reference_pool_ranges(ctc_word_offsets, pool_range=4):
    """Direct port of the reference tiling semantics for comparison
    (reference: preprocess_data/utils.py:155-188), keeping empty gaps."""
    all_word_offsets = [(0, 0, ctc_word_offsets[0][0])]
    for i in range(len(ctc_word_offsets) - 1):
        all_word_offsets.append((1, ctc_word_offsets[i][0], ctc_word_offsets[i][1]))
        all_word_offsets.append((0, ctc_word_offsets[i][1], ctc_word_offsets[i + 1][0]))
    all_word_offsets.append((1, ctc_word_offsets[-1][0], ctc_word_offsets[-1][1]))
    all_word_offsets.append(
        (0, ctc_word_offsets[-1][1], ctc_word_offsets[-1][1] + (pool_range * 2))
    )
    pool_ranges = []
    for is_word, start_offset, end_offset in all_word_offsets:
        if is_word == 1:
            startpoint = start_offset
            endpoint = start_offset + pool_range
            while startpoint < end_offset:
                pool_ranges.append((startpoint, endpoint))
                startpoint += pool_range
                endpoint += pool_range
        else:
            pool_ranges.append((start_offset, end_offset))
    return pool_ranges


def test_pool_ranges_match_reference_semantics():
    words = [
        {"start_offset": 3, "end_offset": 11},
        {"start_offset": 15, "end_offset": 16},
        {"start_offset": 16, "end_offset": 26},  # adjacent → empty gap
    ]
    spans = [(w["start_offset"], w["end_offset"]) for w in words]
    ref = _reference_pool_ranges(spans)
    got = get_ctc_pool_ranges(words)
    # ours == reference minus empty (NaN-producing) gap ranges
    ref_nonempty = [(s, e) for s, e in ref if e > s]
    assert got == ref_nonempty


def test_pool_ranges_empty():
    assert get_ctc_pool_ranges([]) == []
