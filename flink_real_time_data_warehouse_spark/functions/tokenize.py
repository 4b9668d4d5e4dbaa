"""Word segmentation (SURVEY §2.8 F9).

The reference tokenizes search keywords with IK Analyzer Chinese
segmentation (utils/KeywordUtil.java:14-34) exposed as a Flink table
function and invoked via LATERAL TABLE(split_words(...))
(app/dws/KeywordStatsApp.java:82-96). Whitespace splitting — the previous
fallback — produces zero tokens on CJK text, the reference's actual data
domain. Spark-first replacements, best available first:

- jieba_tokens: dictionary segmentation via jieba (the IK-Analyzer
  equivalent), as an Arrow-batched pandas UDF. Gated behind an import
  guard — the container has no jieba; installing it at deploy time makes
  this the preferred path.
- dict_tokens: dictionary segmentation WITHOUT pip — forward maximum
  matching over a vendored mini-lexicon (functions/cjk_lexicon.py), as an
  Arrow-batched pandas UDF. Real multi-character words come out whole
  (实时数据仓库 -> [实时, 数据仓库], not five bigrams); the algorithm is
  identical to what a production dictionary would drive, only the word
  list is small. Deterministic, so a DuckDB recursive-CTE oracle can
  replay the exact same greedy matching.
- mixed_tokens: deterministic dictionary-free segmentation — lowercased
  latin/digit words plus CJK bigrams (the classic CJK fallback search
  engines use without a dictionary; bigrams over-generate slightly but
  never miss a two-char word). Pure Spark SQL collection functions: stays
  in whole-stage codegen, no Python in the hot path, and every step is
  expressible in ANSI SQL so the DuckDB oracle can grade it exactly.
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas_udf type hints resolve
from pyspark.sql import Column
from pyspark.sql import functions as F

# U+4E00..U+9FFF embedded as literal characters: the same regex text works
# in Java regex (Spark) and RE2 (DuckDB), with no escape-processing skew.
CJK_RANGE = "一-鿿"


def latin_tokens(text: Column) -> Column:
    """Lowercased latin/digit words ([a-z0-9]+ runs)."""
    return F.regexp_extract_all(F.lower(text), F.lit("[a-z0-9]+"), 0)


def cjk_bigrams(text: Column) -> Column:
    """Overlapping bigrams of each contiguous CJK run (a 1-char run yields
    itself). `今天天气好` -> [今天, 天天, 天气, 气好]."""
    runs = F.regexp_extract_all(text, F.lit(f"[{CJK_RANGE}]+"), 0)
    per_run = F.transform(
        runs,
        lambda r: F.when(F.length(r) == 1, F.array(r)).otherwise(
            F.transform(F.sequence(F.lit(1), F.length(r) - 1), lambda i: r.substr(i, F.lit(2)))
        ),
    )
    return F.flatten(per_run)


def mixed_tokens(text: Column) -> Column:
    """Full segmentation of mixed latin/CJK text: latin words + CJK bigrams."""
    return F.concat(latin_tokens(text), cjk_bigrams(text))


def dict_tokens():
    """pandas UDF `array<string>`: latin words + dictionary CJK segmentation
    (forward maximum matching over the vendored lexicon).

    The per-row work is a greedy dictionary scan — genuinely imperative, so
    this is the documented Python-UDF exception: Arrow-batched, the lexicon
    a frozenset in the closure (broadcast once per worker, ~KB). Latin
    handling matches mixed_tokens exactly ([a-z0-9]+ runs, lowercased) so
    the two segmenters differ only on CJK text.
    """
    import re

    from pyspark.sql.functions import pandas_udf

    from .cjk_lexicon import fmm_segment

    latin_re = re.compile(r"[a-z0-9]+")
    cjk_re = re.compile(f"[{CJK_RANGE}]+")

    @pandas_udf("array<string>")
    def seg(texts: pd.Series) -> pd.Series:
        def one(t: str | None) -> list[str]:
            t = t or ""
            toks = latin_re.findall(t.lower())
            for run in cjk_re.findall(t):
                toks.extend(fmm_segment(run))
            return toks

        return texts.map(one)

    return seg


def smart_tokens():
    """pandas UDF `array<string>`: latin words + SMART-MODE dictionary CJK
    segmentation — FMM and BMM arbitrated by the published comparison
    heuristic (`cjk_lexicon.smart_segment`), the IK-smart-mode tier
    between plain FMM (`dict_tokens`) and a full jieba deployment. Same
    latin handling and Arrow batching as dict_tokens; the extra cost is
    one backward scan per CJK run, still O(run length * MAX_WORD_LEN)."""
    import re

    from pyspark.sql.functions import pandas_udf

    from .cjk_lexicon import smart_segment

    latin_re = re.compile(r"[a-z0-9]+")
    cjk_re = re.compile(f"[{CJK_RANGE}]+")

    @pandas_udf("array<string>")
    def seg(texts: pd.Series) -> pd.Series:
        def one(t: str | None) -> list[str]:
            t = t or ""
            toks = latin_re.findall(t.lower())
            for run in cjk_re.findall(t):
                toks.extend(smart_segment(run))
            return toks

        return texts.map(one)

    return seg


def jieba_available() -> bool:
    try:
        import jieba  # noqa: F401

        return True
    except ImportError:
        return False


def jieba_tokens():
    """pandas UDF `array<string>`: dictionary CJK segmentation via jieba.

    Raises ImportError where jieba isn't installed — callers choose
    `jieba_tokens() if jieba_available() else mixed_tokens`.
    """
    import jieba  # noqa: F401  (fail fast on the driver, not in executors)
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def seg(texts: pd.Series) -> pd.Series:
        import jieba as _jieba

        return texts.map(
            lambda t: [w for w in _jieba.lcut(t or "") if w.strip()]
        )

    return seg
