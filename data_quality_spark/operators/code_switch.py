"""Within-document code-switch detection (windowed language-ID).

A document whose language CHANGES mid-stream (scraped forum threads,
template boilerplate around foreign content, machine-glued corpora) is
poison for per-document language labels: the doc-level langid reports
the majority language with high confidence and the minority segment
silently enters the wrong training bucket.  ``lang_confusion`` audits
metadata-vs-detected disagreement per doc; this operator audits the
document AGAINST ITSELF:

1. whitespace tokens are split into ``window``-token chunks (a trailing
   chunk under ``MIN_TAIL`` tokens merges into its predecessor — too
   short to score);
2. every window is scored by the shared fastText-style hashed-trigram
   model (``functions.text.LANGID`` — whole-batch vectorized, the same
   kernel the gate uses);
3. a window is CONFIDENT at conf >= ``CONF_MIN`` and lang != "und";
4. the flag is an exact integer law: >= 2 confident windows and the
   runner-up language covering >= 1/4 of them
   (``minority_cnt * 4 >= n_confident``) — one foreign window in a long
   doc is a loanword/quote, a quarter of the doc is a switch.

``n_switches`` (adjacent confident windows disagreeing) separates
A|B block structure from A|B|A|B interleaving.

Execution shape: ONE ``mapInArrow`` pass, windows scored per Arrow
batch, zero shuffles — scales with input splits.  Documented limit:
window conf is batch-composition-stable only to ~1e-14 (the reduceat
law in functions/text.py); the differential oracle's generation guard
asserts every window conf is > 1e-9 from CONF_MIN and every argmax gap
> 1e-9, so decisions never ride the instability.

Reference analog: none (the reference has no language models); the
shape extends the langid rule family of the north-rule gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["code_switch_scan", "WINDOW_TOKENS", "MIN_TAIL", "CONF_MIN",
           "doc_windows", "fold_windows", "snippet"]

WINDOW_TOKENS = 20
MIN_TAIL = 5
# 0.7 keeps domain-jargon word salad (which straddles en/de/pt at
# conf 0.5-0.69 under the trigram model) out of the confident set:
# measured 0 base flags at 0.7 vs 22 at 0.5 on the sf0.01 documents,
# with lexicon-language windows scoring >= 0.97
CONF_MIN = 0.7


def snippet(lang: str, n: int = 40) -> str:
    """Deterministic n-token block of ``lang`` lexicon words — the seeded
    foreign insert used by the query and its twin."""
    from ..functions.text import LEXICONS

    lex = LEXICONS[lang]
    return " ".join(lex[i % len(lex)] for i in range(n))


def doc_windows(text: str | None, window: int = WINDOW_TOKENS) -> list[str]:
    """Deterministic window split shared by the kernel and the oracle."""
    toks = text.split() if text else []
    if len(toks) < MIN_TAIL:
        return []
    chunks = [toks[i: i + window] for i in range(0, len(toks), window)]
    if len(chunks) > 1 and len(chunks[-1]) < MIN_TAIL:
        chunks[-2].extend(chunks[-1])
        chunks.pop()
    return [" ".join(c) for c in chunks]


def fold_windows(langs: list[str], confs: list[float]) -> dict:
    """The exact integer decision law over one doc's scored windows —
    shared constants, replayed independently by the oracle."""
    conf_langs = [lg for lg, cf in zip(langs, confs)
                  if cf >= CONF_MIN and lg != "und"]
    counts: dict[str, int] = {}
    for lg in conf_langs:
        counts[lg] = counts.get(lg, 0) + 1
    if counts:
        # max count, ties to the lexicographically smallest language
        dominant = min(lg for lg in counts
                       if counts[lg] == max(counts.values()))
    else:
        dominant = "und"
    minority = max((c for lg, c in counts.items() if lg != dominant),
                   default=0)
    n_conf = len(conf_langs)
    n_switches = sum(1 for a, b in zip(conf_langs, conf_langs[1:])
                     if a != b)
    return {
        "n_confident": n_conf,
        "dominant_lang": dominant,
        "n_langs": len(counts),
        "minority_cnt": minority,
        "n_switches": n_switches,
        "code_switched": bool(n_conf >= 2 and minority * 4 >= n_conf),
    }


def code_switch_scan(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_windows, n_confident, dominant_lang, n_langs,
    minority_cnt, n_switches, code_switched) — one Arrow pass."""
    col_idx = {f.name: i for i, f in enumerate(docs.schema.fields)}
    id_type = docs.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_type, False),
            T.StructField("n_windows", T.IntegerType(), False),
            T.StructField("n_confident", T.IntegerType(), False),
            T.StructField("dominant_lang", T.StringType(), False),
            T.StructField("n_langs", T.IntegerType(), False),
            T.StructField("minority_cnt", T.IntegerType(), False),
            T.StructField("n_switches", T.IntegerType(), False),
            T.StructField("code_switched", T.BooleanType(), False),
        ]
    )
    id_pa_name = type(id_type).__name__

    def run(batches):
        import pyarrow as pa

        from ..functions.text import LANGID

        for batch in batches:
            ids = batch.column(col_idx[id_col]).to_pylist()
            texts = batch.column(col_idx[text_col]).to_pylist()
            wins = [doc_windows(t) for t in texts]
            flat = [w for ws in wins for w in ws]
            langs, confs = LANGID.score_batch(flat)
            cols: dict[str, list] = {
                k: [] for k in ("n_windows", "n_confident", "dominant_lang",
                                "n_langs", "minority_cnt", "n_switches",
                                "code_switched")
            }
            pos = 0
            for ws in wins:
                k = len(ws)
                st = fold_windows(langs[pos: pos + k], confs[pos: pos + k])
                pos += k
                cols["n_windows"].append(k)
                cols["n_confident"].append(st["n_confident"])
                cols["dominant_lang"].append(st["dominant_lang"])
                cols["n_langs"].append(st["n_langs"])
                cols["minority_cnt"].append(st["minority_cnt"])
                cols["n_switches"].append(st["n_switches"])
                cols["code_switched"].append(st["code_switched"])
            id_pa = {"LongType": pa.int64(), "IntegerType": pa.int32(),
                     "StringType": pa.string()}[id_pa_name]
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=id_pa)]
                + [pa.array(cols[k],
                            type=pa.bool_() if k == "code_switched"
                            else (pa.string() if k == "dominant_lang"
                                  else pa.int32()))
                   for k in ("n_windows", "n_confident", "dominant_lang",
                             "n_langs", "minority_cnt", "n_switches",
                             "code_switched")],
                names=[id_col, "n_windows", "n_confident", "dominant_lang",
                       "n_langs", "minority_cnt", "n_switches",
                       "code_switched"],
            )

    return docs.select(id_col, text_col).mapInArrow(run, out_schema)
