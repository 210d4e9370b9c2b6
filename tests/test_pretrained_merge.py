"""Cross-stage pretrained weight transfer (reference filtered
load_state_dict, ppo_trainer.py:301-513): merge_matching_params copies
matching subtrees, keeps mismatched/missing ones fresh."""

import numpy as np

from avlen_tpu.utils.checkpoint import merge_matching_params


def test_merge_matching_params_copies_and_skips():
    target = {
        "params": {
            "tower": {"kernel": np.zeros((4, 4)), "bias": np.zeros((4,))},
            "head": {"kernel": np.zeros((4, 2))},
        }
    }
    source = {
        "params": {
            "tower": {"kernel": np.ones((4, 4)), "bias": np.ones((8,))},  # bias shape differs
            "extra_head": {"kernel": np.ones((4, 3))},  # not in target
        }
    }
    merged, copied, skipped = merge_matching_params(target, source)
    np.testing.assert_array_equal(np.asarray(merged["params"]["tower"]["kernel"]), 1.0)
    np.testing.assert_array_equal(np.asarray(merged["params"]["tower"]["bias"]), 0.0)
    np.testing.assert_array_equal(np.asarray(merged["params"]["head"]["kernel"]), 0.0)
    assert copied == ["params/tower/kernel"]
    assert "params/tower/bias" in skipped and "params/head" in skipped


def test_vocab_from_file(tmp_path):
    from avlen_tpu.dialog.speaker.vocab import PAD, Vocabulary

    path = tmp_path / "train_vocab.txt"
    path.write_text("walk\nhall\nstairs\n")
    v = Vocabulary.from_file(str(path))
    assert v.idx2word[0] == PAD and "stairs" in v.word2idx
    ids = v.encode(["walk", "unknownword"], max_len=6)
    assert len(ids) == 6
