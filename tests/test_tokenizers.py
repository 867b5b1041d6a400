"""Tokenizer parity: BPE checked token-for-token against the reference
implementation on the shipped GPT-2 vocab/merges assets; wordpiece/char/
space/vocab behaviors unit-tested."""

import os
import sys
from argparse import Namespace

import pytest

from lr2ppo_tpu.data.tokenizers import (
    BertTokenizer,
    BPETokenizer,
    CharTokenizer,
    SpaceTokenizer,
    Vocab,
    VirtualTokenizer,
    str2tokenizer,
)

REF = "/root/reference"
VOCAB = f"{REF}/models/huggingface_gpt2_vocab.txt"
MERGES = f"{REF}/models/huggingface_gpt2_merges.txt"


@pytest.fixture(scope="module")
def ref_bpe():
    if not os.path.isdir(os.path.join(REF, "tencentpretrain")):
        pytest.skip("reference repo not mounted")
    cwd = os.getcwd()
    sys.path.insert(0, REF)
    os.chdir(REF)
    try:
        from tencentpretrain.utils.tokenizers import BPETokenizer as RefBPE

        args = Namespace(spm_model_path=None, vocab_path=VOCAB,
                         merges_path=MERGES)
        yield RefBPE(args)
    finally:
        os.chdir(cwd)
        sys.path.remove(REF)


SAMPLES = [
    "Hello world!",
    "  leading spaces and\ttabs",
    "the quick brown fox's 42 jumps, over #tags & emojis ✨",
    "CamelCase and UPPER and l'apostrophe don't",
    "",
]


def test_bpe_parity_with_reference(ref_bpe):
    mine = BPETokenizer(VOCAB, MERGES)
    for s in SAMPLES:
        assert mine.tokenize(s) == ref_bpe.tokenize(s), s
        assert (mine.convert_tokens_to_ids(mine.tokenize(s))
                == ref_bpe.convert_tokens_to_ids(ref_bpe.tokenize(s))), s


def test_bpe_roundtrip():
    if not os.path.exists(VOCAB):
        pytest.skip("reference BPE assets not mounted")
    mine = BPETokenizer(VOCAB, MERGES)
    s = "round trip of bytes éè中文"
    assert mine.decode(mine.tokenize(s)) == s


def test_char_space_tokenizers(tmp_path):
    vp = tmp_path / "v.txt"
    vp.write_text("<unk>\na\nb\nhello\n")
    c = CharTokenizer(str(vp))
    assert c.tokenize("ab!") == ["a", "b", "<unk>"]
    s = SpaceTokenizer(str(vp))
    assert s.tokenize("hello there") == ["hello", "<unk>"]
    assert s.convert_tokens_to_ids(["hello", "<unk>"]) == [3, 0]


def test_wordpiece():
    t = BertTokenizer()
    t.vocab = {"un": 0, "##aff": 1, "##able": 2, "hello": 3, "<unk>": 4,
               ",": 5}
    t.inv_vocab = {v: k for k, v in t.vocab.items()}
    assert t.tokenize("unaffable hello,") == ["un", "##aff", "##able",
                                              "hello", ","]
    assert t.tokenize("xyzzy") == ["<unk>"]


def test_vocab_build(tmp_path):
    corpus = tmp_path / "c.txt"
    corpus.write_text("a b b c c c\n")
    v = Vocab.build(str(corpus), SpaceTokenizer(), min_count=2)
    assert v.get("c") < v.get("b")  # sorted by count desc
    assert "a" not in v.w2i


def test_registry_complete():
    for kind in ("char", "space", "bert", "bpe", "xlmroberta", "virtual",
                 "image", "text_image"):
        assert kind in str2tokenizer
    assert VirtualTokenizer().tokenize("anything") == []


def test_vocab_build_multiprocess_matches_single(tmp_path):
    from lr2ppo_tpu.data.tokenizers import SpaceTokenizer, Vocab

    corpus = tmp_path / "c.txt"
    rng = __import__("numpy").random.default_rng(0)
    lines = [" ".join(rng.choice(list("abcdefgh"), 6)) for _ in range(200)]
    corpus.write_text("\n".join(lines) + "\n")
    tok = SpaceTokenizer(None)
    single = Vocab.build(str(corpus), tok, min_count=2, workers_num=1)
    multi = Vocab.build(str(corpus), tok, min_count=2, workers_num=3)
    assert single.i2w == multi.i2w
    assert len(single) > 5


class TestSentencePieceUnigram:
    """Pure-Python Unigram backend (VERDICT r2 #9): the XLM-R path must
    run self-contained — no sentencepiece package, no shipped assets."""

    PIECES = [("<unk>", 0.0), ("<s>", 0.0), ("</s>", 0.0),
              ("▁hello", -1.0), ("▁world", -1.2),
              ("▁hel", -3.0), ("lo", -3.5), ("▁", -4.0),
              ("h", -6.0), ("e", -6.0), ("l", -6.0), ("o", -6.0),
              ("w", -6.0), ("r", -6.0), ("d", -6.0)]

    def _spm_bytes(self):
        """Serialize PIECES as a real sentencepiece ModelProto (pieces =
        repeated field 1 of {piece: field 1 string, score: field 2
        float32}) so the wire-format parser is tested against the actual
        encoding."""
        import struct

        def varint(v):
            out = b""
            while True:
                b7 = v & 0x7F
                v >>= 7
                out += bytes([b7 | (0x80 if v else 0)])
                if not v:
                    return out

        blob = b""
        for piece, score in self.PIECES:
            pb = piece.encode("utf-8")
            sub = (b"\x0a" + varint(len(pb)) + pb            # field 1, wire 2
                   + b"\x15" + struct.pack("<f", score))     # field 2, wire 5
            blob += b"\x0a" + varint(len(sub)) + sub         # ModelProto.pieces
        # trailing unrelated field (trainer_spec, field 2 wire 2): must be
        # skipped cleanly
        blob += b"\x12\x02\x08\x01"
        return blob

    def test_viterbi_prefers_whole_words(self):
        from lr2ppo_tpu.data.tokenizers import SentencePieceUnigram

        uni = SentencePieceUnigram(self.PIECES)
        assert uni.encode("hello world") == ["▁hello", "▁world"]
        # unknown chars fall back per character, known pieces still win
        assert uni.encode("hellox")[:1] == ["▁hello"]

    def test_model_proto_roundtrip(self, tmp_path):
        from lr2ppo_tpu.data.tokenizers import SentencePieceUnigram

        p = tmp_path / "toy.model"
        p.write_bytes(self._spm_bytes())
        uni = SentencePieceUnigram.from_model_proto(str(p))
        assert uni.vocab["▁hello"] == 3
        assert abs(uni.scores["▁world"] - (-1.2)) < 1e-6
        assert uni.encode("hello world") == ["▁hello", "▁world"]

    def test_xlmr_tokenizer_self_contained(self, tmp_path):
        from lr2ppo_tpu.data.tokenizers import XLMRobertaTokenizer

        # .model file through the built-in parser (no sentencepiece pkg
        # -> backend must be 'unigram' in this image, 'spm' if present:
        # both tokenize identically on this toy model)
        mp = tmp_path / "toy.model"
        mp.write_bytes(self._spm_bytes())
        tok = XLMRobertaTokenizer(spm_model_path=str(mp))
        toks = tok.tokenize("hello world")
        assert toks == ["▁hello", "▁world"]
        ids = tok.convert_tokens_to_ids(toks)
        assert ids == [3, 4]

        # plain vocab path
        vp = tmp_path / "vocab.txt"
        vp.write_text("".join(f"{p}\t{s}\n" for p, s in self.PIECES),
                      encoding="utf-8")
        tok2 = XLMRobertaTokenizer(vocab_path=str(vp))
        assert tok2.backend == "unigram"
        assert tok2.tokenize("hello world") == toks
        assert tok2.convert_tokens_to_ids(toks) == ids

    def test_truncated_model_raises_value_error(self, tmp_path):
        """A cut-off .model must produce the parser's ValueError naming
        the file, not a raw IndexError/struct.error from mid-parse."""
        import pytest

        from lr2ppo_tpu.data.tokenizers import SentencePieceUnigram

        blob = self._spm_bytes()
        for cut in (len(blob) - 3, len(blob) // 2, 1):
            p = tmp_path / f"cut{cut}.model"
            p.write_bytes(blob[:cut])
            with pytest.raises(ValueError, match=str(p)):
                SentencePieceUnigram.from_model_proto(str(p))
