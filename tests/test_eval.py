"""ReasonAQA evaluation subsystem (mellow_tpu/eval.py): metric
correctness vs hand-computed values and the installed nltk BLEU oracle,
manifest loading of the reference-documented JSON (README.md:89-114),
and an end-to-end run_eval through the wrapper."""

import json

import numpy as np
import jax

from mellow_tpu import eval as ev


def test_normalize_and_exact_match():
    assert ev.exact_match("The Cat.", "cat") == 1.0
    assert ev.exact_match("  YES!", "yes") == 1.0
    assert ev.exact_match("no", "yes") == 0.0
    assert ev.normalize_text("An  apple, a day.") == "apple day"


def test_token_f1_hand_value():
    # pred tokens {loud, dog, barks}; answer {dog, barks, loudly}:
    # overlap 2 -> P = R = 2/3 -> F1 = 2/3.
    f1 = ev.token_f1("a loud dog barks", "dog barks loudly")
    assert abs(f1 - 2 / 3) < 1e-9
    assert ev.token_f1("", "") == 1.0
    assert ev.token_f1("cat", "") == 0.0


def test_corpus_bleu_identity_and_brevity():
    out = ev.corpus_bleu(["the cat sat on the mat"],
                         [["the cat sat on the mat"]])
    for n in range(1, 5):
        assert abs(out[f"bleu{n}"] - 1.0) < 1e-9
    # pred 2 tokens vs ref 3: unigram/bigram precision 1, bp = exp(1-3/2)
    out = ev.corpus_bleu(["cat sat"], [["cat sat mat"]])
    bp = np.exp(1 - 3 / 2)
    assert abs(out["bleu1"] - bp) < 1e-9
    assert abs(out["bleu2"] - bp) < 1e-9


def test_corpus_bleu_matches_nltk():
    from nltk.translate.bleu_score import corpus_bleu as nltk_bleu

    preds = [
        "a dog barks loudly in the yard",
        "water drips from a leaky faucet",
        "someone plays a fast piano melody",
    ]
    refs = [
        ["a large dog barks in the yard", "a dog is barking outside"],
        ["water is dripping from the faucet"],
        ["a piano melody plays quickly", "someone plays the piano"],
    ]
    ours = ev.corpus_bleu(preds, refs)
    hyp_tok = [ev.tokenize(p) for p in preds]
    ref_tok = [[ev.tokenize(r) for r in rl] for rl in refs]
    for n in range(1, 5):
        w = tuple([1.0 / n] * n)
        expect = nltk_bleu(ref_tok, hyp_tok, weights=w)
        assert abs(ours[f"bleu{n}"] - expect) < 1e-9, (n, ours, expect)


def test_cider_d_identity_corpus():
    # Disjoint-vocabulary documents: every n-gram has df=1, so idf > 0,
    # and a prediction identical to its reference scores the maximum 10.
    refs = [
        ["alpha bravo charlie delta echo foxtrot"],
        ["golf hotel india juliet kilo lima"],
    ]
    preds = [refs[0][0], refs[1][0]]
    assert abs(ev.cider_d(preds, refs) - 10.0) < 1e-9
    # A wrong prediction scores strictly lower.
    worse = ev.cider_d(["alpha bravo charlie delta echo golf"], [refs[0]] )
    assert worse < 10.0


def test_cider_d_clips_ngram_stuffing():
    # (corpus of >= 2 docs: with a single document every idf is 0 and
    # CIDEr is 0 by construction — official scorer behavior.)
    refs = [
        ["dog barks in yard today loudly"],
        ["rain falls on tin roof quietly"],
    ]
    honest = ev.cider_d([refs[0][0], refs[1][0]], refs)
    stuffed = ev.cider_d(["dog dog dog dog dog dog", refs[1][0]], refs)
    assert honest > stuffed


def test_load_manifest_reference_format(tmp_path):
    # Exact documented shape, reference README.md:89-114; filepath2 empty
    # for single-audio tasks -> the clip is passed twice.
    data = [
        {
            "taskname": "audiocaps",
            "filepath1": "a/1.wav",
            "filepath2": "b/2.wav",
            "caption1": "x",
            "caption2": "y",
            "input": "explain the difference in few words",
            "answer": "audio 1 is louder",
            "subtype": "ACD-1.json",
        },
        {
            "taskname": "clothov21",
            "filepath1": "c/3.wav",
            "filepath2": "",
            "caption1": "z",
            "caption2": "",
            "input": "is there a dog? answer yes or no",
            "answer": "yes",
            "subtype": "ClothoAQA-binary.json",
        },
    ]
    p = tmp_path / "test.json"
    p.write_text(json.dumps(data))
    exs = ev.load_manifest(str(p), audio_root="/root/audio")
    assert exs[0].audio1 == "/root/audio/a/1.wav"
    assert exs[0].audio2 == "/root/audio/b/2.wav"
    assert exs[1].audio2 == exs[1].audio1 == "/root/audio/c/3.wav"
    assert ev.is_closed_form(exs[1].subtype)
    assert not ev.is_closed_form(exs[0].subtype)


def test_score_group_routing():
    closed = ev.score_group(["yes", "no"], ["yes", "yes"], "ClothoAQA-binary")
    assert closed["exact_match"] == 0.5
    assert "bleu4" not in closed
    free = ev.score_group(
        ["dog barks loudly outside today"],
        ["dog barks loudly outside today"], "AudioCaps.json"
    )
    assert free["exact_match"] == 1.0
    assert abs(free["bleu4"] - 1.0) < 1e-9
    assert "cider_d" in free


def test_run_eval_end_to_end(tmp_path):
    """Full manifest -> wrapper.generate -> per-subtype reports, through
    the real pipeline (random small weights + byte tokenizer)."""
    from mellow_tpu.config import MellowConfig, HTSATConfig, LlamaConfig, register_config
    from mellow_tpu.io.tokenizer import ByteTokenizer
    from mellow_tpu.models import mellow as jmellow
    from mellow_tpu.wrapper import MellowWrapper

    cfg = MellowConfig(
        name="test_eval_small",
        encoder=HTSATConfig(embed_dim=8, out_emb=64),
        decoder=LlamaConfig(
            vocab_size=512, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        ),
        d_proj=64,
        text_tokenization_len=8,
        prefix_length=268,
    )
    register_config("test_eval_small", cfg)
    params = jmellow.init_params(jax.random.PRNGKey(0), cfg)
    wrapper = MellowWrapper(
        "test_eval_small", "v0", 0, params=params, tokenizer=ByteTokenizer()
    )
    wav = "/root/reference/resource/1.wav"
    data = [
        {"taskname": "clothov21", "filepath1": wav, "filepath2": "",
         "input": "is there noise? yes or no", "answer": "yes",
         "subtype": "ClothoAQA-binary.json"},
        {"taskname": "audiocaps", "filepath1": wav, "filepath2": wav,
         "input": "caption the audio", "answer": "a city street",
         "subtype": "AudioCaps.json"},
    ]
    p = tmp_path / "m.json"
    p.write_text(json.dumps(data))
    exs = ev.load_manifest(str(p))
    reports, preds = ev.run_eval(
        wrapper, exs, batch_size=2, max_len=4, stop_token="\x00"
    )
    assert len(preds) == 2
    assert set(reports) == {"ClothoAQA-binary.json", "AudioCaps.json", "OVERALL"}
    assert reports["ClothoAQA-binary.json"].n == 1
    assert reports["OVERALL"].n == 2
    assert "cider_d" in reports["AudioCaps.json"].metrics
    assert "bleu4" not in reports["ClothoAQA-binary.json"].metrics
    print(ev.format_report(reports))
