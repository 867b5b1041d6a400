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

    # (piece, score, type): 2=UNKNOWN, 3=CONTROL — the real XLM-R model
    # marks its specials so they never enter Viterbi segmentation
    PIECES = [("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3),
              ("▁hello", -1.0), ("▁world", -1.2),
              ("▁hel", -3.0), ("lo", -3.5), ("▁", -4.0),
              ("h", -6.0), ("e", -6.0), ("l", -6.0), ("o", -6.0),
              ("w", -6.0), ("r", -6.0), ("d", -6.0),
              ("s", -6.0), ("<", -6.5), (">", -6.5)]

    @staticmethod
    def _varint(v):
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            out += bytes([b7 | (0x80 if v else 0)])
            if not v:
                return out

    def _spm_bytes(self, pieces=None, normalizer=None):
        """Serialize pieces as a real sentencepiece ModelProto (pieces =
        repeated field 1 of {piece: 1 (string), score: 2 (float32),
        type: 3 (varint)}; normalizer_spec = field 3 of {name: 1,
        add_dummy_prefix: 3, remove_extra_whitespaces: 4,
        escape_whitespaces: 5}) so the wire-format parser is tested
        against the actual encoding."""
        import struct

        varint = self._varint
        blob = b""
        for entry in (pieces if pieces is not None else self.PIECES):
            piece, score, ptype = entry if len(entry) == 3 else (*entry, 1)
            pb = piece.encode("utf-8")
            sub = (b"\x0a" + varint(len(pb)) + pb            # field 1, wire 2
                   + b"\x15" + struct.pack("<f", score))     # field 2, wire 5
            if ptype != 1:
                sub += b"\x18" + varint(ptype)               # field 3, wire 0
            blob += b"\x0a" + varint(len(sub)) + sub         # ModelProto.pieces
        # trailing unrelated field (trainer_spec, field 2 wire 2): must be
        # skipped cleanly
        blob += b"\x12\x02\x08\x01"
        if normalizer is not None:
            nb = b""
            name = normalizer.get("name")
            if name is not None:
                nbb = name.encode("utf-8")
                nb += b"\x0a" + varint(len(nbb)) + nbb       # name = 1
            for num, key in ((3, "add_dummy_prefix"),
                             (4, "remove_extra_whitespaces"),
                             (5, "escape_whitespaces")):
                if key in normalizer:
                    nb += (bytes([num << 3])
                           + varint(int(normalizer[key])))
            blob += b"\x1a" + varint(len(nb)) + nb           # spec = 3
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
        vp.write_text("".join(f"{e[0]}\t{e[1]}\n" for e in self.PIECES),
                      encoding="utf-8")
        tok2 = XLMRobertaTokenizer(vocab_path=str(vp))
        assert tok2.backend == "unigram"
        assert tok2.tokenize("hello world") == toks
        assert tok2.convert_tokens_to_ids(toks) == ids

    def test_control_pieces_not_segmentable(self):
        """ADVICE r3: literal '<s>' text in the input must NOT segment
        to the control-token id (real spm excludes non-NORMAL pieces
        from the Viterbi vocabulary; ids stay addressable)."""
        from lr2ppo_tpu.data.tokenizers import SentencePieceUnigram

        uni = SentencePieceUnigram(self.PIECES)
        assert uni.vocab["<s>"] == 1          # id preserved
        toks = uni.encode("<s> hello")
        assert "<s>" not in toks              # chars, not the control id
        assert "▁hello" in toks

    def test_normalization_essentials(self):
        """VERDICT r3 #4: NFKC + whitespace handling must match real
        sentencepiece's nmt_nfkc on the cases the reference hits."""
        from lr2ppo_tpu.data.tokenizers import SentencePieceUnigram

        uni = SentencePieceUnigram(self.PIECES)
        base = uni.encode("hello world")
        # repeated/exotic whitespace collapses (U+3000 ideographic space,
        # tabs, newlines, leading/trailing)
        assert uni.encode("  hello 　\t\n world  ") == base
        # NFKC compatibility folding: fullwidth latin -> ascii
        assert uni.encode("ｈｅｌｌｏ　ｗｏｒｌｄ") == base
        # NFC vs decomposed input converge to the same segmentation
        assert (uni.encode("he\u0301llo")     # e+combining acute
                == uni.encode("h\u00e9llo"))  # composed é
        # zero-width junk is dropped by the nmt rules
        assert uni.encode("hel\u200blo\u200d world\ufeff") == base

    def test_empty_and_whitespace_only_input(self):
        """Round-4 review: real spm returns [] for empty/whitespace-only
        input — the dummy prefix must not manufacture a lone '▁'."""
        from lr2ppo_tpu.data.tokenizers import SentencePieceUnigram

        uni = SentencePieceUnigram(self.PIECES)
        assert uni.encode("") == []
        assert uni.encode("   ") == []
        assert uni.encode(" \t\n　 ") == []

    def test_identity_normalizer_keeps_raw_whitespace(self, tmp_path):
        """Round-4 review: an 'identity' NormalizerSpec has an EMPTY
        precompiled charsmap in real spm — tabs/newlines pass through
        and segment as unknown chars instead of unifying to '▁'."""
        from lr2ppo_tpu.data.tokenizers import SentencePieceUnigram

        p = tmp_path / "ident.model"
        p.write_bytes(self._spm_bytes(normalizer={"name": "identity"}))
        uni = SentencePieceUnigram.from_model_proto(str(p))
        toks = uni.encode("hello\tworld")
        assert "\t" in toks                    # raw tab survives
        assert toks[0] == "▁hello"
        # the default nmt_nfkc rules DO unify the tab to a space
        default = SentencePieceUnigram(self.PIECES)
        assert default.encode("hello\tworld") == ["▁hello", "▁world"]

    def test_normalizer_spec_parsed_and_applied(self, tmp_path):
        from lr2ppo_tpu.data.tokenizers import SentencePieceUnigram

        p = tmp_path / "nodummy.model"
        p.write_bytes(self._spm_bytes(normalizer={
            "name": "nmt_nfkc", "add_dummy_prefix": False,
            "remove_extra_whitespaces": False}))
        uni = SentencePieceUnigram.from_model_proto(str(p))
        assert uni.normalizer["add_dummy_prefix"] is False
        assert uni.normalizer["remove_extra_whitespaces"] is False
        assert uni.normalizer["name"] == "nmt_nfkc"
        toks = uni.encode("hello world")
        assert toks[0] != "▁hello"            # no dummy prefix
        assert "▁world" in toks
        # identity normalizer skips NFKC: fullwidth stays unknown chars
        p2 = tmp_path / "ident.model"
        p2.write_bytes(self._spm_bytes(normalizer={"name": "identity"}))
        uni2 = SentencePieceUnigram.from_model_proto(str(p2))
        assert "▁hello" not in uni2.encode("ｈｅｌｌｏ")

    def test_byte_fallback_pieces(self):
        from lr2ppo_tpu.data.tokenizers import SentencePieceUnigram

        pieces = ([("<unk>", 0.0, 2), ("▁hi", -1.0), ("▁", -2.0)]
                  + [(f"<0x{b:02X}>", -8.0, 6) for b in range(256)])
        uni = SentencePieceUnigram(pieces)
        assert len(uni.byte_pieces) == 256
        # '©' (U+00A9) is not in the vocab: its UTF-8 bytes C2 A9 come
        # out as BYTE pieces instead of an unknown-char token
        assert uni.encode("hi ©") == ["▁hi", "▁", "<0xC2>", "<0xA9>"]
        # multi-byte CJK falls back to 3 bytes per char
        toks = uni.encode("hi 漢")
        assert toks[:2] == ["▁hi", "▁"]
        assert toks[2:] == ["<0xE6>", "<0xBC>", "<0xA2>"]
        # ids resolve through the ordinary vocab
        assert all(t in uni.vocab for t in toks)

    def test_matches_real_sentencepiece_when_available(self, tmp_path):
        """Token-for-token parity with the actual spm runtime (runs
        wherever the sentencepiece package exists; this image ships
        without it, so the self-contained goldens above carry the
        coverage here)."""
        spm = pytest.importorskip("sentencepiece")

        corpus = tmp_path / "corpus.txt"
        corpus.write_text(
            "\n".join(["hello world", "hello there", "the world spins",
                       "worlds collide", "say hello"] * 20),
            encoding="utf-8")
        spm.SentencePieceTrainer.Train(
            input=str(corpus), model_prefix=str(tmp_path / "toy"),
            vocab_size=60, model_type="unigram", byte_fallback=True,
            character_coverage=1.0)
        sp = spm.SentencePieceProcessor()
        sp.Load(str(tmp_path / "toy.model"))
        from lr2ppo_tpu.data.tokenizers import SentencePieceUnigram

        uni = SentencePieceUnigram.from_model_proto(
            str(tmp_path / "toy.model"))
        for text in ["hello world", "  hello 　 world  ",
                     "ｈｅｌｌｏ ｗｏｒｌｄ", "héllo", "漢字 test",
                     "hello\t\nworld", "<s> hello"]:
            assert uni.encode(text) == sp.EncodeAsPieces(text), text

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
