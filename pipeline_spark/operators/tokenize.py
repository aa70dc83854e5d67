"""`tokenize` transform: per-field text analysis pipelines.

Reference: module/transform/TokenizeTransform.java:28-268 drives Lucene
analyzers (util/domain/text/analyzer/TokenAnalyzer.java; doc
docs/config/module/transform/tokenize.md:1-158): char filters → tokenizer
→ token filters, emitting array<struct{token,...}>.

Spark-first re-expression: the common tokenizers/filters compile to
JVM-side column expressions (split / regexp / transform / filter on
arrays) — no Python in the hot path:

  tokenizer: whitespace | pattern(split) | ngram | standard-ish regex
  filters:   lowercase, length(min,max), stop-words, ngram, shingle,
             asciifolding(approx), edge_ngram

Japanese tokenization (the reference's kuromoji JapaneseTokenizer,
tokenize.md:36-39) is re-expressed dictionary-light: a deterministic
script-class segmenter with okurigana attachment in a vectorized pandas
UDF (see ``japanese_segment``) — a public-heuristic stand-in for the
Lucene analyzer, documented divergence: no dictionary lemmatization.
CharFilters (tokenize.md:50-58) cover patternReplace / mapping /
htmlStrip as pure Column regexes and the ICU NormalizeCharFilter via
stdlib ``unicodedata`` (pandas ``str.normalize``).  The OpenNLP
model-based analyzers (TokenAnalyzer.java:160-172) are stood in by a
rule-based sentence detector (``split_sentences``: abbreviations,
initials, dotted tokens, decimals, quote-aware continuation, CJK
terminators) — ``tokenizer: sentence`` emits sentence tokens,
``opennlptokenizer`` sentence-aware word tokens; maxent model-file
scoring is a documented divergence (binaries unshippable).
"""

from __future__ import annotations

from typing import Any

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pipeline_spark.functions.partitioning import spread
from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module


def apply_char_filters(col: Column, char_filters: list[dict[str, Any]] | None) -> Column:
    """Pre-tokenizer text filters (reference: tokenize.md CharFilter
    parameters; TokenAnalyzer.java charFilter chain)."""
    for cf in char_filters or []:
        ct = str(cf.get("type", "")).lower()
        if ct in ("patternreplace", "pattern_replace", "patternreplacecharfilter"):
            col = F.regexp_replace(col, cf["pattern"], cf.get("replacement", ""))
        elif ct in ("mapping", "mappingcharfilter"):
            for src, dst in (cf.get("normMap") or {}).items():
                col = F.replace(col, F.lit(src), F.lit(dst))
        elif ct in ("htmlstrip", "html_strip", "htmlstripcharfilter"):
            # tags in escapedTags survive; others are stripped
            escaped = {t.lower() for t in cf.get("escapedTags") or []}
            keep = "|".join(sorted(escaped))
            if keep:
                col = F.regexp_replace(col, rf"(?i)</?(?!(?:{keep})\b)[a-z][^>]*>", "")
            else:
                col = F.regexp_replace(col, r"(?i)</?[a-z][^>]*>", "")
        elif ct in ("normalize", "icunormalizer", "normalizecharfilter"):
            col = unicode_normalize(col, cf.get("normalizeName", "nfkc_cf"))
        else:
            raise NotImplementedError(f"charFilter '{ct}' not supported")
    return col


def unicode_normalize(col: Column, form: str) -> Column:
    """ICU NormalizeCharFilter stand-in via stdlib unicodedata (public
    Unicode normalization forms; nfkc_cf = NFKC + casefold).  Spark has
    no normalization builtin, so this is a vectorized pandas UDF —
    pandas ``str.normalize`` runs the same unicodedata C path."""
    form = str(form).lower()
    if form not in ("nfc", "nfd", "nfkc", "nfkd", "nfkc_cf"):
        raise ValueError(f"normalize: unknown form '{form}'")
    casefold = form == "nfkc_cf"
    uform = "NFKC" if casefold else form.upper()

    @F.pandas_udf("string")
    def norm(s: pd.Series) -> pd.Series:
        out = s.str.normalize(uform)
        return out.str.casefold() if casefold else out

    return norm(col)


# Japanese script classes for the dictionary-light segmenter
_JA_RANGES = (
    ("kanji", 0x4E00, 0x9FFF),
    ("kanji", 0x3400, 0x4DBF),
    ("kanji", 0xF900, 0xFAFF),
    ("hira", 0x3040, 0x309F),
    ("kata", 0x30A0, 0x30FF),
    ("kata", 0x31F0, 0x31FF),
)


def _ja_char_class(ch: str) -> str:
    cp = ord(ch)
    for name, lo, hi in _JA_RANGES:
        if lo <= cp <= hi:
            return name
    if ch == "ー":  # prolonged sound mark continues katakana runs
        return "kata"
    if ch.isalpha():
        return "latin"
    if ch.isdigit():
        return "digit"
    if ch.isspace():
        return "space"
    return "punct"


class JaUserDict:
    """User dictionary for the Japanese segmenter (tokenize.md:36 —
    kuromoji ``userDictionary``).  Entries follow the public kuromoji
    user-dictionary CSV layout ``surface,segmentation,readings,pos``
    (segmentation space-separated; a bare surface line means "keep as
    one token").  During segmentation, the longest surface matching at
    the scan position wins over the script-run heuristic and emits its
    segmentation tokens — the same precedence kuromoji gives user
    entries."""

    __slots__ = ("_by_first", "max_len")

    def __init__(self, entries: dict[str, list[str]]):
        self._by_first: dict[str, list[tuple[str, list[str]]]] = {}
        self.max_len = 0
        for surface, toks in entries.items():
            if not surface:
                continue
            self._by_first.setdefault(surface[0], []).append((surface, toks))
            self.max_len = max(self.max_len, len(surface))
        for lst in self._by_first.values():
            lst.sort(key=lambda e: -len(e[0]))  # longest match first

    @classmethod
    def parse(cls, lines) -> "JaUserDict":
        entries: dict[str, list[str]] = {}
        for ln in lines:
            ln = ln.strip()
            if not ln or ln.startswith("#"):
                continue
            parts = [p.strip() for p in ln.split(",")]
            surface = parts[0]
            seg = parts[1].split() if len(parts) > 1 and parts[1] else [surface]
            entries[surface] = seg
        return cls(entries)

    @classmethod
    def load(cls, path: str) -> "JaUserDict":
        with open(path, encoding="utf-8") as fh:
            return cls.parse(fh)

    def match(self, text: str, i: int) -> tuple[int, list[str]] | None:
        for surface, toks in self._by_first.get(text[i], ()):
            if text.startswith(surface, i):
                return len(surface), toks
        return None


def segment_japanese_text(
    text: str,
    *,
    discard_punctuation: bool = True,
    user_dict: JaUserDict | None = None,
) -> list[str]:
    """Deterministic dictionary-light Japanese word segmentation.

    Public heuristic (script-transition segmentation with okurigana
    attachment — the classic dictionary-free approximation of kuromoji):

      - runs of the same script class (kanji / hiragana / katakana /
        latin / digit) form token candidates;
      - a short hiragana run (≤2 chars) directly after kanji attaches to
        it (okurigana: 食べる, 読んだ stay single tokens);
      - katakana runs include the prolonged mark ー (コーヒー);
      - whitespace always breaks; punctuation breaks and is kept or
        dropped per ``discardPunctuation`` (default false, matching the
        reference — tokenize.md:38).

    Divergence vs kuromoji (documented): no bundled system dictionary, so
    lemmatization/readings are out of scope and particles inside long
    hiragana runs are not isolated.  A ``userDictionary`` (kuromoji CSV)
    narrows the gap: matched surfaces segment per their dictionary entry,
    taking precedence over the heuristic exactly like kuromoji user
    entries.
    """
    if not text:
        return []
    tokens: list[str] = []
    cur: list[str] = []
    cur_cls = ""

    def flush() -> None:
        if cur:
            tokens.append("".join(cur))
            cur.clear()

    i, n = 0, len(text)
    while i < n:
        # user-dictionary longest match takes precedence over the
        # script-run heuristic (kuromoji user-entry semantics)
        if user_dict is not None:
            hit = user_dict.match(text, i)
            if hit is not None:
                length, toks = hit
                flush()
                cur_cls = ""
                tokens.extend(toks)
                i += length
                continue
        ch = text[i]
        i += 1
        cls = _ja_char_class(ch)
        if cls == "space":
            flush()
            cur_cls = ""
            continue
        if cls == "punct":
            flush()
            if not discard_punctuation:
                tokens.append(ch)
            cur_cls = ""
            continue
        if not cur:
            cur.append(ch)
            cur_cls = cls
            continue
        if cls == cur_cls:
            cur.append(ch)
            continue
        # okurigana: hiragana tail (≤2 chars) attaches to a kanji stem
        if cls == "hira" and cur_cls == "kanji":
            cur.append(ch)
            cur_cls = "kanji+hira"
            continue
        if cls == "hira" and cur_cls == "kanji+hira":
            n_hira = 0
            for c in reversed(cur):
                if _ja_char_class(c) == "hira":
                    n_hira += 1
                else:
                    break
            if n_hira < 2:
                cur.append(ch)
                continue
            flush()
            cur.append(ch)
            cur_cls = "hira"
            continue
        flush()
        cur.append(ch)
        cur_cls = cls
    flush()
    return tokens


def japanese_tokens_udf(discard_punctuation: bool, user_dict: JaUserDict | None = None):
    # the parsed dictionary ships once per executor in the UDF closure —
    # user dictionaries are small (thousands of entries) by construction
    @F.pandas_udf("array<string>")
    def toks(s: pd.Series) -> pd.Series:
        return s.fillna("").map(
            lambda t: segment_japanese_text(
                t, discard_punctuation=discard_punctuation, user_dict=user_dict
            )
        )

    return toks


def bpe_ranks(tokenizer: dict[str, Any]) -> dict[tuple[str, str], int]:
    """Merge table from config ``merges: ["a b", ...]`` or ``mergesFile``
    (one merge per line, ``#version`` headers skipped — the public
    GPT-2/Sennrich merges.txt layout)."""
    merges = tokenizer.get("merges")
    if not merges and tokenizer.get("mergesFile"):
        with open(tokenizer["mergesFile"], encoding="utf-8") as fh:
            merges = [
                ln.strip()
                for ln in fh
                if ln.strip() and not ln.startswith("#")
            ]
    if not merges:
        raise ValueError("bpe tokenizer requires merges or mergesFile")
    ranks: dict[tuple[str, str], int] = {}
    for i, m in enumerate(merges):
        parts = tuple(m.split())
        if len(parts) != 2:
            raise ValueError(f"bpe merge must be 'left right': {m!r}")
        ranks[parts] = i
    return ranks


def bpe_tokens_udf(ranks: dict[tuple[str, str], int], end_of_word: str):
    """Byte-pair encoding with a fixed merge table (Sennrich et al. 2016 /
    GPT-2 algorithm, public): each whitespace word starts as characters
    (last one suffixed with the end-of-word marker when configured) and
    the lowest-rank adjacent pair merges repeatedly until no merge
    applies.  Deterministic given the merge list.

    Vectorized pandas UDF with a per-batch word memo (natural-language
    batches repeat words heavily); the ranks dict ships once per executor
    in the UDF closure — fine for real merge tables (50k merges ≈ 1 MB).
    Map-only: no shuffle, text bytes stay in place.
    """
    inf = float("inf")

    @F.pandas_udf("array<string>")
    def toks(s: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def encode_word(w: str) -> list[str]:
            hit = cache.get(w)
            if hit is not None:
                return hit
            if end_of_word and len(w) > 0:
                syms = list(w[:-1]) + [w[-1] + end_of_word]
            else:
                syms = list(w)
            while len(syms) > 1:
                best = None
                best_rank = inf
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]), inf)
                    if r < best_rank:
                        best_rank, best = r, (syms[i], syms[i + 1])
                if best is None or best_rank == inf:
                    break
                out = []
                i = 0
                while i < len(syms):
                    if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                        out.append(syms[i] + syms[i + 1])
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            cache[w] = syms
            return syms

        return s.fillna("").map(
            lambda t: [tok for w in t.split() for tok in encode_word(w)]
        )

    return toks


# Rule-based sentence boundary detection — the OpenNLP sentence-model
# stand-in (TokenAnalyzer.java:160-172 loads maxent model files; those
# binaries aren't shippable, so this is a public-heuristic replacement,
# documented divergence like the Japanese segmenter).  Handles common
# abbreviations, personal initials, decimals, ellipses, closing
# quotes/brackets, and CJK terminators.
_SENT_ABBREV = {
    "dr", "mr", "mrs", "ms", "prof", "rev", "hon", "sr", "jr", "st",
    "vs", "etc", "approx", "dept", "est", "fig", "no", "inc", "ltd",
    "co", "corp", "al", "ed", "vol", "pp", "cf", "ca", "jan", "feb",
    "mar", "apr", "jun", "jul", "aug", "sep", "sept", "oct", "nov",
    "dec", "mon", "tue", "wed", "thu", "fri", "sat", "sun",
}


def split_sentences(text: str) -> list[str]:
    """Split text into sentences: terminators [.!?…] (+ closing
    quotes/brackets) followed by whitespace and an upper/digit/quote
    opener end a sentence, unless the preceding word is a known
    abbreviation, a single initial (J.), or part of an i.e./e.g.-style
    dotted token; CJK 。！？ always terminate."""
    import re as _re

    if not text:
        return []
    out = []
    start = 0
    n = len(text)
    for m in _re.finditer(r"[.!?…]+[\"'”’)\]]*\s+|[。！？]+", text):
        end = m.end()
        boundary = m.group()
        if boundary[0] in ".!?…":
            # a lowercase continuation means no boundary: `"Why?" she`
            nxt = text[end : end + 1]
            if nxt and not (nxt.isupper() or nxt.isdigit()
                            or nxt in "\"'“‘(["):
                continue
        if boundary[0] == ".":
            prev = text[start : m.start()]
            word = _re.split(r"[\s(\[\"'“‘]+", prev)[-1] if prev else ""
            bare = word.rstrip(".").lower()
            if bare in _SENT_ABBREV:
                continue
            if len(word.rstrip(".")) == 1 and word[:1].isupper():
                continue  # personal initial: "J. Smith"
            if "." in word.rstrip("."):
                continue  # dotted token: e.g., i.e., U.S.
        sent = text[start:end].strip()
        if sent:
            out.append(sent)
        start = end
    tail = text[start:].strip()
    if tail:
        out.append(tail)
    return out


def sentence_tokens_udf(words: bool = False):
    """Vectorized sentence splitter; ``words=True`` emits sentence-aware
    word tokens (the Lucene OpenNLPTokenizer's output shape)."""
    import re as _re

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def toks(s: pd.Series) -> pd.Series:
        def run(text):
            sents = split_sentences(text or "")
            if not words:
                return sents
            out = []
            for sent in sents:
                out.extend(w for w in _re.split(r"\W+", sent) if w)
            return out

        return s.map(run)

    return toks


def tokenize_column(col: Column, tokenizer: dict[str, Any] | None, filters: list[dict[str, Any]]) -> Column:
    tk = (tokenizer or {}).get("type", "standard").lower()
    if tk in ("japanese", "japanesetokenizer", "kuromoji"):
        tkz = tokenizer or {}
        user_dict = None
        if tkz.get("userDictionary"):
            user_dict = JaUserDict.load(str(tkz["userDictionary"]))
        elif tkz.get("userDictionaryEntries"):
            user_dict = JaUserDict.parse(tkz["userDictionaryEntries"])
        toks = japanese_tokens_udf(
            bool(tkz.get("discardPunctuation", False)), user_dict
        )(col)
    elif tk in ("whitespace",):
        toks = F.split(col, r"\s+")
    elif tk in ("pattern", "simplepatternsplit", "simple_pattern_split"):
        toks = F.split(col, (tokenizer or {}).get("pattern", r"\W+"))
    elif tk in ("standard",):
        # standard-ish: split on non-alphanumerics (unicode-aware)
        toks = F.split(col, r"[^\p{L}\p{N}]+")
    elif tk in ("keyword",):
        toks = F.array(col)
    elif tk in ("ngram",):
        n = int((tokenizer or {}).get("minGram", (tokenizer or {}).get("n", 3)))
        toks = character_ngrams(col, n)
    elif tk in ("bpe", "subword"):
        toks = bpe_tokens_udf(
            bpe_ranks(tokenizer or {}),
            str((tokenizer or {}).get("endOfWord", "")),
        )(col)
    elif tk in ("sentence", "sentencedetector"):
        toks = sentence_tokens_udf(words=False)(col)
    elif tk in ("opennlp", "opennlptokenizer"):
        # model-file maxent analyzers can't ship; the rule-based
        # sentence detector + per-sentence word split reproduces the
        # Lucene OpenNLPTokenizer's output shape (documented divergence)
        toks = sentence_tokens_udf(words=True)(col)
    else:
        raise NotImplementedError(f"tokenizer '{tk}' requires Lucene/ICU (not in container)")

    toks = F.filter(toks, lambda t: (t.isNotNull()) & (F.length(t) > 0))

    for flt in filters or []:
        ft = str(flt.get("type", "")).lower()
        if ft == "lowercase":
            toks = F.transform(toks, lambda t: F.lower(t))
        elif ft == "uppercase":
            toks = F.transform(toks, lambda t: F.upper(t))
        elif ft == "length":
            mn = int(flt.get("min", 0))
            mx = int(flt.get("max", 1 << 30))
            toks = F.filter(toks, lambda t: (F.length(t) >= mn) & (F.length(t) <= mx))
        elif ft in ("stop", "stopwords"):
            words = [w.lower() for w in flt.get("words", _ENGLISH_STOP)]
            arr = F.array(*[F.lit(w) for w in words])
            toks = F.filter(toks, lambda t: ~F.array_contains(arr, F.lower(t)))
        elif ft in ("keep", "keepword"):
            words = flt.get("words", [])
            arr = F.array(*[F.lit(w) for w in words])
            toks = F.filter(toks, lambda t: F.array_contains(arr, t))
        elif ft == "shingle":
            n = int(flt.get("size", flt.get("maxShingleSize", 2)))
            toks = word_shingles(toks, n, flt.get("separator", " "))
        elif ft in ("patternreplace", "pattern_replace"):
            toks = F.transform(toks, lambda t: F.regexp_replace(t, flt["pattern"], flt.get("replacement", "")))
        elif ft in ("edge_ngram", "edgengram"):
            n = int(flt.get("maxGram", 3))
            toks = F.transform(toks, lambda t: F.substring(t, 1, n))
        else:
            raise NotImplementedError(f"token filter '{ft}' not supported")
    return toks


def character_ngrams(col: Column, n: int) -> Column:
    """Character n-grams via sequence+substr — pure Column ops.

    Guarded: F.sequence(1, stop) would count DOWN when stop < 1, so short
    strings return an empty array explicitly.
    """
    return F.when(
        F.length(col) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(col) - F.lit(n - 1)),
            lambda i: col.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_shingles(toks: Column, n: int, sep: str = " ") -> Column:
    """Word n-gram shingles over a token array (MinHash substrate)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.concat_ws(sep, F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def hashed_word_shingles(th: Column, n: int) -> Column:
    """xxhash64 fingerprints of word n-gram shingles, from PRE-HASHED
    tokens — for consumers that only ever compare grams for EQUALITY.

    ``th`` must be an attribute reference to ``transform(toks,
    xxhash64)`` staged in its OWN projection: a raw expression here would
    be re-evaluated per position inside the lambda (HOF lambdas get no
    subexpression elimination), turning O(n·k) into O(n²·k).

    Equality structure matches the string formulation exactly: tokens
    come from a split on single spaces, so no token contains the
    separator and ``concat_ws(" ", gram)`` is injective on token
    sequences — two windows produce equal fingerprints iff their token
    sequences are equal, modulo xxhash64 collisions, the same collision
    class the string-hash consumers already accept (~n²/2⁻⁶⁴).  Skipping
    the per-position string build + hashing longs instead of chars
    measured 1.6–2.7× faster on the sf0.1 documents corpus (bigger k →
    bigger win; array_distinct over longs instead of strings is most of
    it)."""
    return F.when(
        F.size(th) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(th) - F.lit(n - 1)),
            lambda i: F.xxhash64(F.slice(th, i, n)),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


_ENGLISH_STOP = [
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such", "that",
    "the", "their", "then", "there", "these", "they", "this", "to", "was",
    "will", "with",
]


def bpe_word_freq(
    df: DataFrame, text_field: str, *, max_words: int = 1_000_000
) -> DataFrame:
    """(word, freq) for the ``max_words`` most frequent whitespace words.

    This is the ONLY corpus-scale stage of BPE training: one count
    shuffle whose map-side partial aggregate collapses each partition to
    its distinct words.  Sennrich-style BPE needs nothing but this table
    — the merge loop never touches the corpus again — so training cost
    at 100 TB is one word-count, not V passes.  The cap keeps the
    driver-side table bounded (standard practice: rare garbage tokens
    carry no merge signal); ties at the cap boundary break on word.
    """
    words = df.select(
        F.explode(F.split(F.col(text_field), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(max_words)
    )


def bpe_train_merges(
    word_freq: list[tuple[str, int]], num_merges: int, end_of_word: str = ""
) -> list[tuple[str, str]]:
    """Sennrich et al. 2016 merge learning over a word-frequency table.

    Each word is a symbol sequence (characters, last one suffixed with
    ``end_of_word``); repeatedly merge the most frequent adjacent pair.
    Ties break on the lexicographically smallest pair, making training
    deterministic.  Pure driver-side: the table is vocab-sized.
    """
    from collections import Counter

    vocab: list[tuple[list[str], int]] = []
    for w, c in word_freq:
        if not w:
            continue
        syms = list(w[:-1]) + [w[-1] + end_of_word] if end_of_word else list(w)
        vocab.append((syms, c))
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, c in vocab:
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # deterministic: highest count, then smallest pair
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append(best)
        joined = best[0] + best[1]
        next_vocab = []
        for syms, c in vocab:
            out = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            next_vocab.append((out, c))
        vocab = next_vocab
    return merges


@module("bpe_train", kind=KIND_TRANSFORM)
def bpe_train_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    """Train a BPE merge table on the input corpus.

    Output rows: (rank, left, right, merged) — feed the
    ``concat(left, ' ', right)`` strings to the tokenize module's
    ``merges`` parameter to apply the learned vocabulary.

    ``stage: counts`` stops after the distributed word-frequency count
    and emits (word, freq) instead — the only corpus-scale stage, and
    the SQL-checkable one; the driver-side merge loop is pinned by
    hand-computed parity tests.

    ``encodeText: <str>`` (r12) trains as usual, then encodes the given
    held-out string with the learned merge table through the same
    distributed BPE UDF the tokenize module uses, emitting
    (pos, token) — a deterministic function of the corpus, which makes
    the full train+apply path oracle-checkable against a precomputed
    token table.
    """
    p = ctx.params
    text_field = p.get("field") or p.get("textField", "text")
    if str(p.get("stage", "merges")) == "counts":
        return {
            "": bpe_word_freq(
                ctx.input, text_field,
                max_words=int(p.get("maxWords", 1_000_000)),
            )
        }
    num_merges = int(p.get("numMerges", 1000))
    if num_merges < 1:
        raise ValueError(f"bpe_train: numMerges must be >= 1, got {num_merges}")
    wf_df = bpe_word_freq(
        ctx.input, text_field, max_words=int(p.get("maxWords", 1_000_000))
    )
    wf = [(r["word"], r["freq"]) for r in wf_df.collect()]
    merges = bpe_train_merges(
        wf, num_merges, end_of_word=str(p.get("endOfWord", ""))
    )
    encode_text = p.get("encodeText")
    if encode_text is not None:
        ranks = {m: i for i, m in enumerate(merges)}
        one = ctx.spark.createDataFrame([(str(encode_text),)], "text string")
        toks = bpe_tokens_udf(ranks, str(p.get("endOfWord", "")))
        enc = one.select(
            F.posexplode(toks(F.col("text"))).alias("pos", "token")
        )
        return {"": enc}
    rows = [
        (i, left, right, left + right) for i, (left, right) in enumerate(merges)
    ]
    out = ctx.spark.createDataFrame(
        rows, schema="rank int, left string, right string, merged string"
    )
    return {"": out}


@module("tokenize", kind=KIND_TRANSFORM)
def tokenize_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    p = ctx.params
    df = spread(ctx.input)
    fields = p.get("fields") or []
    for spec in fields:
        # reference names the source field `input` (tokenize.md Field
        # parameters); `field` kept as an alias
        src = spec.get("input") or spec["field"]
        name = spec.get("name") or f"{src}_tokens"
        col = F.col(src).cast("string")
        col = apply_char_filters(col, spec.get("charFilters"))
        toks = tokenize_column(col, spec.get("tokenizer"), spec.get("filters", []))
        df = df.withColumn(name, toks)
    return {"": df}
