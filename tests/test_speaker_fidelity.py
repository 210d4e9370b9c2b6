"""Speaker fidelity tests (VERDICT r1 missing #3): corpus BLEU-4 golden
against nltk, the speaker eval harness (eval_speaker.py parity), and the
panorama visual feature bank (ResNet-152 panorama feature counterpart,
R2R env.py:40-74)."""

import numpy as np
import pytest

from avlen_tpu.dialog.speaker.eval_speaker import (
    corpus_bleu,
    evaluate_neural_vs_template,
    evaluate_speaker,
)
from avlen_tpu.dialog.speaker.speaker import Speaker
from avlen_tpu.dialog.speaker.vocab import Vocabulary
from avlen_tpu.sim.graph import build_scene_tables
from avlen_tpu.sim.synthetic import make_grid_scene

CORPORA = [
    # (candidates, references) token corpora
    (
        [["go", "straight", "then", "turn", "left", "at", "the", "chair"]],
        [[["go", "straight", "then", "turn", "left", "at", "the", "chair"]]],
    ),
    (
        [
            ["go", "forward", "two", "steps", "then", "stop", "there", "now"],
            ["turn", "right", "and", "walk", "to", "the", "sofa", "then", "stop"],
        ],
        [
            [["go", "forward", "three", "steps", "then", "stop", "there", "now"],
             ["move", "forward", "two", "steps", "then", "stop", "here", "now"]],
            [["turn", "right", "and", "walk", "toward", "the", "sofa", "then", "stop"]],
        ],
    ),
    (
        [["a", "b", "c"], ["c", "b", "a", "d", "e", "f", "g", "h"]],
        [[["a", "b", "c", "d", "e"]], [["c", "b", "a", "d", "e", "f", "x", "y"]]],
    ),
]


def test_corpus_bleu_matches_nltk():
    nltk_bleu = pytest.importorskip("nltk.translate.bleu_score")
    for cands, refs in CORPORA:
        got = corpus_bleu(cands, refs)
        # nltk argument order: list_of_references first
        want = nltk_bleu.corpus_bleu([list(r) for r in refs], [list(c) for c in cands])
        assert got == pytest.approx(want, abs=1e-9), (cands, got, want)


def test_corpus_bleu_perfect_and_degenerate():
    assert corpus_bleu([["x", "y", "z", "w"]], [[["x", "y", "z", "w"]]]) == pytest.approx(1.0)
    assert corpus_bleu([["a", "a", "a", "a"]], [[["b", "c", "d", "e"]]]) == 0.0


def _tables(n_scenes=1, side=4, seed=0):
    rng = np.random.RandomState(seed)
    return [build_scene_tables(make_grid_scene(rng, side)) for _ in range(n_scenes)]


def test_template_speaker_scores_bleu_one_against_itself():
    tables = _tables()
    spk = Speaker([t.positions for t in tables], backend="template")
    res = evaluate_neural_vs_template(spk, spk, tables, num_paths=8, seed=1)
    assert res["bleu"] == pytest.approx(1.0)
    assert res["num"] > 0


def test_panorama_feature_bank_and_speaker_integration():
    import jax

    from avlen_tpu.dialog.speaker.pano_features import (
        heading_to_rot_index,
        init_panorama_encoder,
        precompute_panorama_features,
    )

    tables = _tables(side=3)
    n = tables[0].num_nodes
    rgb = np.random.RandomState(0).randint(0, 255, (1, n, 4, 16, 16, 3), np.uint8)
    enc, params = init_panorama_encoder(jax.random.key(0), frame_hw=16)
    pano = precompute_panorama_features(rgb, params, enc, batch=8)
    assert pano.shape[:3] == (1, n, 4) and np.isfinite(pano).all()
    # deterministic: same frame -> same feature
    pano2 = precompute_panorama_features(rgb, params, enc, batch=16)
    np.testing.assert_allclose(pano, pano2, rtol=2e-5, atol=2e-5)

    # rot index convention: rot r faces (270 - 90r) % 360
    assert heading_to_rot_index(270) == 0
    assert heading_to_rot_index(180) == 1
    assert heading_to_rot_index(90) == 2
    assert heading_to_rot_index(0) == 3

    vocab = Vocabulary()
    spk = Speaker(
        [t.positions for t in tables], backend="neural", vocab=vocab, pano_features=pano
    )
    from avlen_tpu.dialog.speaker.speaker import GEOM_DIM, NUM_CATEGORIES

    assert spk.feat_dim == GEOM_DIM + NUM_CATEGORIES + pano.shape[-1]
    acts, feats, ln = spk.path_features(0, [0, 1, 2], 270)
    assert feats.shape[1] == spk.feat_dim
    # visual slice of step 0 equals the walked-direction view of node 0
    p = tables[0].positions
    d = int(np.around(np.rad2deg(np.arctan2(p[1][2] - p[0][2], p[1][0] - p[0][0])))) % 360
    np.testing.assert_allclose(
        feats[0, GEOM_DIM + NUM_CATEGORIES:], pano[0, 0, int(heading_to_rot_index(d))]
    )
    out = spk.generate_instr([{"heading": 270, "scene": 0, "path": [0, 1, 2]}])
    assert isinstance(out[0]["words"], list)


def test_train_speaker_with_pano_features_learns():
    import jax

    from avlen_tpu.dialog.speaker.pano_features import (
        init_panorama_encoder,
        precompute_panorama_features,
    )
    from avlen_tpu.dialog.speaker.train_speaker import train_speaker

    tables = _tables(side=3)
    n = tables[0].num_nodes
    rgb = np.random.RandomState(1).randint(0, 255, (1, n, 4, 16, 16, 3), np.uint8)
    enc, params = init_panorama_encoder(jax.random.key(0), frame_hw=16)
    pano = precompute_panorama_features(rgb, params, enc, batch=8)
    params, vocab, acc = train_speaker(
        tables, num_steps=80, batch=16, hidden_size=32, pano_features=pano
    )
    assert acc > 0.15  # learning signal present with visual features attached


def test_evaluate_speaker_reports_corpus_stats():
    tables = _tables()
    spk = Speaker([t.positions for t in tables], backend="template")
    items = [{"heading": 270, "scene": 0, "path": [0, 1]}]
    refs = [[spk.generate_instr(items)[0]["words"]]]
    res = evaluate_speaker(spk, items, refs)
    assert set(res) == {"bleu", "avg_len", "num"} and res["bleu"] == pytest.approx(1.0)


def test_beam_rollout_beam1_matches_greedy_and_beam4_decodes():
    """beam_rollout(beam_size=1) must reproduce the greedy decode exactly;
    a wider beam must return hypotheses whose total log-probability is at
    least the greedy one's (beam search can only improve model score)."""
    import jax
    import jax.numpy as jnp

    from avlen_tpu.dialog.speaker.model import Seq2SeqSpeaker

    vocab = Vocabulary()
    model = Seq2SeqSpeaker(vocab_size=len(vocab), hidden_size=32, world_feat_dim=8,
                           max_decode_len=12)
    rng = np.random.RandomState(3)
    b, l = 4, 6
    acts = jnp.asarray(rng.randint(0, 5, (b, l)), jnp.int32)
    feats = jnp.asarray(rng.randn(b, l, 8), jnp.float32)
    lens = jnp.asarray([l, l - 1, 3, 1], jnp.int32)
    params = model.init(jax.random.key(0), acts, feats, lens, vocab.bos_id,
                        vocab.eos_id, method=Seq2SeqSpeaker.rollout)

    greedy = model.apply(params, acts, feats, lens, vocab.bos_id, vocab.eos_id,
                         method=Seq2SeqSpeaker.rollout)
    beam1 = model.apply(params, acts, feats, lens, vocab.bos_id, vocab.eos_id, 1,
                        method=Seq2SeqSpeaker.beam_rollout)
    # greedy pads beyond EOS with argmax continuations; compare up to first EOS
    def upto_eos(ids):
        out = []
        for row in np.asarray(ids):
            stop = np.where(row == vocab.eos_id)[0]
            out.append(tuple(row[: stop[0] + 1] if len(stop) else row))
        return out

    assert upto_eos(beam1) == upto_eos(greedy)

    beam4 = model.apply(params, acts, feats, lens, vocab.bos_id, vocab.eos_id, 4,
                        method=Seq2SeqSpeaker.beam_rollout)
    assert beam4.shape == (b, 12)

    def seq_logp(ids):
        """Total log-prob of each decoded sequence under teacher forcing."""
        bos = jnp.full((b, 1), vocab.bos_id, jnp.int32)
        inp = jnp.concatenate([bos, jnp.asarray(ids)[:, :-1]], axis=1)
        logits = model.apply(params, acts, feats, lens, inp,
                             method=Seq2SeqSpeaker.teacher_logits)
        lp = jax.nn.log_softmax(logits, axis=-1)
        tok = jnp.take_along_axis(lp, jnp.asarray(ids)[..., None], axis=-1)[..., 0]
        # mask past first EOS (inclusive)
        arr = np.asarray(ids)
        mask = np.zeros_like(arr, np.float32)
        for i, row in enumerate(arr):
            stop = np.where(row == vocab.eos_id)[0]
            mask[i, : (stop[0] + 1 if len(stop) else arr.shape[1])] = 1.0
        return np.asarray((tok * mask).sum(axis=1))

    assert (seq_logp(beam4) >= seq_logp(beam1) - 1e-4).all()


def test_speaker_pipeline_beam_backend():
    tables = _tables()
    spk = Speaker([t.positions for t in tables], backend="neural", beam_size=3)
    items = [{"heading": 270, "scene": 0, "path": [0, 1, 2]}]
    outs = spk.generate_instr(items)
    assert len(outs) == 1 and isinstance(outs[0]["words"], list)
