"""Distributed BPE (byte-pair-encoding) vocabulary training.

The missing piece between q74's fixed BPE-ish regex segmentation and a
real LLM data pipeline: LEARN the subword merge table from the corpus
itself (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units" — public algorithm). Classic trainers run
single-node over a word-frequency dict; the Spark form keeps exactly
that structure distributed:

1. ONE corpus-scale shuffle builds the word-frequency table
   (`groupBy(word).count()`) — the standard BPE compression trick:
   every later step runs over the VOCABULARY (unique words, ~10^5–10^7
   rows regardless of corpus bytes), never over the corpus again. This
   is what makes 100 TB BPE training cheap: the corpus is touched once.
2. Each merge round is one hash-aggregate over the vocab table
   (adjacent-pair counts weighted by word frequency) + a LIMIT 1
   argmax — a single driver-collected row per round, like q57's
   convergence scalar; bounded and justified.
3. The pair merge itself is a JVM-side `aggregate` fold over the
   symbol array (greedy left-to-right, the reference semantics) — no
   Python in the loop; `localCheckpoint` truncates the k-round lineage
   exactly as q57 does.

Determinism: ties on pair count break lexicographically (min left,
then min right), so the merge sequence is a pure function of the
word-frequency table; validated token-for-token against a pure-Python
reference implementation in tests/test_curation_properties.py.

Known optimization not taken: production BPE trainers update pair
counts incrementally (only words containing the merged pair change
between rounds). Here every round recounts all pairs over the vocab
table — simpler, exactly verifiable, and the recount input is the
vocab (not the corpus), so the savings at 100 TB are bounded by vocab
size; rounds are driver-latency-bound locally either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# symbols fold: greedy left-to-right merge of one (a, b) pair, the
# published BPE semantics ('aaa' + pair (a,a) -> [aa, a], not [a, aa]);
# {s} is the input array expression, so folds nest for encoding
_MERGE_FOLD_TPL = """
aggregate({s}, cast(array() as array<string>),
  (acc, x) -> CASE WHEN size(acc) > 0
                    AND element_at(acc, -1) = '{a}' AND x = '{b}'
              THEN concat(slice(acc, 1, size(acc) - 1), array('{ab}'))
              ELSE concat(acc, array(x)) END)
"""


def encode_expr(word_col: str, merges: list[tuple[str, str, str]]) -> str:
    """SQL expression tokenizing a lowercase-alpha ``word_col`` into
    its BPE subwords: split to characters, then apply every trained
    ``(left, right, merged)`` in rank order — each merge one greedy
    left-to-right JVM-side fold, nested so the whole encode is a
    single codegen'd expression (no Python, no join, no shuffle).
    This is the apply-side twin of :func:`train_bpe`: the merge table
    is tiny (an artifact a tokenizer ships) and is baked into the
    expression, so encoding distributes like any scan-local
    projection."""
    e = f"filter(split({word_col}, ''), x -> x <> '')"
    for a, b, ab in merges:
        if not (a.isalpha() and b.isalpha()):
            raise ValueError(f"non-alpha BPE symbols {(a, b)!r}")
        e = _MERGE_FOLD_TPL.format(s=e, a=a, b=b, ab=ab)
    return e

_PAIRS_EXPR = """
CASE WHEN size(s) < 2 THEN cast(array() as array<struct<a: string, b: string>>)
     ELSE transform(slice(s, 1, size(s) - 1), (x, i) -> struct(x AS a, s[i + 1] AS b))
END
"""


def train_bpe(
    spark: SparkSession, word_freq: DataFrame, n_merges: int
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from a ``(word, freq)`` frame;
    words must be lowercase-alpha (enforced — symbol literals are
    spliced into SQL expressions). Returns the merge table
    ``(merge_rank, left, right, merged, pair_freq)`` — the artifact a
    tokenizer ships."""
    syms = word_freq.select(
        "freq", F.expr("filter(split(word, ''), x -> x <> '')").alias("s")
    ).localCheckpoint()

    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            syms.select("freq", F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        if not (a.isalpha() and b.isalpha()):
            raise ValueError(f"non-alpha BPE symbols {(a, b)!r}")
        merges.append((rank, a, b, a + b, cnt))
        old = syms
        syms = syms.withColumn(
            "s", F.expr(_MERGE_FOLD_TPL.format(s="s", a=a, b=b, ab=a + b))
        ).localCheckpoint()
        old.unpersist()
    syms.unpersist()

    return spark.createDataFrame(
        merges, "merge_rank int, left string, right string, merged string, pair_freq long"
    )
