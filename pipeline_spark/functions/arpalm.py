"""ARPA n-gram language model: train, parse, and score with backoff.

Training-data-pipeline extension (BASELINE.json north star).  CCNet-style
corpus curation (Wenzek et al. 2019) filters documents by perplexity under
a Kneser-Ney n-gram LM (KenLM).  KenLM binaries are not shippable here, but
the ARPA text format and the backoff scoring rule are fully public
(Stolcke's SRILM man pages; Jurafsky & Martin ch. 3), so this module
implements them natively:

  train_arpa   deterministic absolute-discounting trainer (D = 0.75),
               additive-smoothed unigrams with an explicit ``<unk>`` —
               a well-defined, reproducible stand-in for interpolated
               Kneser-Ney that emits standard ARPA text, so tests and
               oracles need no model fixture files.
  parse_arpa   reads any ARPA file (KenLM/SRILM output included).
  ArpaLM       iterative backoff scorer: longest matching n-gram wins,
               otherwise accumulate the context's log10 backoff weight
               and shorten the context; unigram miss scores ``<unk>``.

Spark integration is in ``operators/textstats.py`` (op ``perplexity``):
the parsed model is broadcast once and scored in a vectorized pandas UDF
— map-only, zero shuffle, so a 100 TB corpus pass is embarrassingly
parallel and the model rides the broadcast (KenLM-scale models are
100s of MB — well inside broadcast range; the op refuses models above
``maxModelBytes``).
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Iterable

__all__ = ["train_arpa", "parse_arpa", "ArpaLM", "normalize_tokens"]

#: log10 probability assigned to OOV words when the model has no <unk>
_NO_UNK_LOGPROB = -99.0


def normalize_tokens(text: str | None) -> list[str]:
    """Lowercase + whitespace-split — the same normalization the other
    textstats ops use, mirrored by the SQL oracle."""
    if text is None:
        return []
    return text.lower().split()


def train_arpa(
    corpus: Iterable[str | list[str]], order: int = 2, discount: float = 0.75
) -> str:
    """Train an absolute-discounted backoff LM and return ARPA text.

    Per order k >= 2, with denom(h) = total continuations of context h:

        P(w | h)  = (c(h,w) - D) / denom(h)                for seen (h,w)
        bo(h)     = leftover(h) / (1 - seen_lower_mass(h))  (Katz alpha)

    where leftover(h) = D * |{w : c(h,w) > 0}| / denom(h) and
    seen_lower_mass(h) = sum over seen continuations w of the (k-1)-order
    backoff probability P(w | h[1:]) — the normalization that makes
    sum_w P(w | h) == 1 exactly (asserted in tests).

    Unigrams are additive-smoothed over the observed vocabulary plus an
    explicit ``<unk>``: P(w) = (c(w)+1)/(N+V+1), P(<unk>) = 1/(N+V+1).
    Deterministic (sorted emission), so the same corpus always produces
    byte-identical ARPA text.
    """
    if order < 1:
        raise ValueError(f"arpalm: order must be >= 1, got {order}")
    if not (0.0 < discount < 1.0):
        raise ValueError(f"arpalm: discount must be in (0,1), got {discount}")
    counts: list[Counter] = [Counter() for _ in range(order + 1)]  # [k]
    for sent in corpus:
        toks = normalize_tokens(sent) if isinstance(sent, str) else [
            t.lower() for t in sent
        ]
        for k in range(1, order + 1):
            for i in range(len(toks) - k + 1):
                counts[k][tuple(toks[i : i + k])] += 1

    n_tokens = sum(counts[1].values())
    vocab = sorted(w for (w,) in counts[1])
    denom1 = n_tokens + len(vocab) + 1

    # entries[k]: gram -> [logprob, backoff-or-None]
    entries: list[dict] = [dict() for _ in range(order + 1)]
    entries[1][("<unk>",)] = [math.log10(1.0 / denom1), None]
    for w in vocab:
        entries[1][(w,)] = [math.log10((counts[1][(w,)] + 1.0) / denom1), None]

    def lower_logprob(ctx: tuple, w: str) -> float:
        """Backoff log10 P(w | ctx) under the orders built so far."""
        acc = 0.0
        while True:
            hit = entries[len(ctx) + 1].get(ctx + (w,))
            if hit is not None:
                return acc + hit[0]
            if not ctx:
                return acc + entries[1][("<unk>",)][0]
            bo = entries[len(ctx)].get(ctx, [0.0, None])[1]
            acc += bo if bo is not None else 0.0
            ctx = ctx[1:]

    for k in range(2, order + 1):
        denom: Counter = Counter()
        types: Counter = Counter()
        for gram, c in counts[k].items():
            denom[gram[:-1]] += c
            types[gram[:-1]] += 1
        cont: dict[tuple, list[str]] = {}
        for gram, c in counts[k].items():
            entries[k][gram] = [
                math.log10((c - discount) / denom[gram[:-1]]),
                None,
            ]
            cont.setdefault(gram[:-1], []).append(gram[-1])
        for ctx in denom:
            leftover = discount * types[ctx] / denom[ctx]
            seen_lower = sum(10.0 ** lower_logprob(ctx[1:], w) for w in cont[ctx])
            unseen = 1.0 - seen_lower
            if ctx in entries[k - 1]:
                # degenerate contexts (no unseen lower mass) keep bo = 1,
                # i.e. fall through to the undiscounted lower model
                bo = leftover / unseen if unseen > 1e-12 else 1.0
                entries[k - 1][ctx][1] = math.log10(bo)

    lines = ["\\data\\"]
    for k in range(1, order + 1):
        lines.append(f"ngram {k}={len(entries[k])}")
    for k in range(1, order + 1):
        lines.append("")
        lines.append(f"\\{k}-grams:")
        for gram in sorted(entries[k]):
            lp, bo = entries[k][gram]
            line = f"{lp:.6f}\t{' '.join(gram)}"
            if bo is not None:
                line += f"\t{bo:.6f}"
            lines.append(line)
    lines.append("")
    lines.append("\\end\\")
    return "\n".join(lines)


class ArpaLM:
    """Parsed ARPA model with standard backoff scoring."""

    def __init__(self, grams: list[dict], order: int):
        #: grams[k]: tuple(k words) -> (log10 prob, log10 backoff)
        self.grams = grams
        self.order = order
        self.unk_logprob = grams[1].get(("<unk>",), (_NO_UNK_LOGPROB, 0.0))[0]

    def logprob(self, context: tuple, w: str) -> float:
        """log10 P(w | context) under the ARPA backoff rule."""
        ctx = tuple(context[-(self.order - 1) :]) if self.order > 1 else ()
        acc = 0.0
        while True:
            hit = self.grams[len(ctx) + 1].get(ctx + (w,))
            if hit is not None:
                return acc + hit[0]
            if not ctx:
                return acc + self.unk_logprob
            acc += self.grams[len(ctx)].get(ctx, (0.0, 0.0))[1]
            ctx = ctx[1:]

    def score(self, tokens: list[str]) -> tuple[float, int]:
        """Sum of per-token log10 probs (each token conditioned on the
        preceding tokens, no sentence-boundary marks) and token count."""
        total = 0.0
        for i, w in enumerate(tokens):
            total += self.logprob(tuple(tokens[max(0, i - self.order + 1) : i]), w)
        return total, len(tokens)

    def perplexity(self, tokens: list[str]) -> float | None:
        lp, n = self.score(tokens)
        if n == 0:
            return None
        return 10.0 ** (-lp / n)


def parse_arpa(text: str) -> ArpaLM:
    """Parse ARPA text (SRILM/KenLM layout) into an :class:`ArpaLM`.

    Tolerates both tab- and space-separated fields; the per-section order
    disambiguates whether a trailing number is a backoff weight.
    """
    lines = iter(text.splitlines())
    for line in lines:
        if line.strip() == "\\data\\":
            break
    else:
        raise ValueError("arpalm: no \\data\\ header — not an ARPA file")
    ngram_counts: dict[int, int] = {}
    for line in lines:
        s = line.strip()
        if not s:
            break
        if s.startswith("ngram"):
            k, n = s[len("ngram") :].split("=")
            ngram_counts[int(k)] = int(n)
    if not ngram_counts:
        raise ValueError("arpalm: empty \\data\\ section")
    order = max(ngram_counts)
    grams: list[dict] = [dict() for _ in range(order + 1)]
    k = 0
    for line in lines:
        s = line.strip()
        if not s:
            continue
        if s == "\\end\\":
            break
        if s.endswith("-grams:") and s.startswith("\\"):
            k = int(s[1 : s.index("-")])
            continue
        if k == 0:
            continue
        parts = s.split()
        if len(parts) < 1 + k:
            raise ValueError(f"arpalm: malformed {k}-gram line: {line!r}")
        lp = float(parts[0])
        if len(parts) >= 2 + k:
            gram, bo = tuple(parts[1 : 1 + k]), float(parts[1 + k])
        else:
            gram, bo = tuple(parts[1 : 1 + k]), 0.0
        grams[k][gram] = (lp, bo)
    return ArpaLM(grams, order)
