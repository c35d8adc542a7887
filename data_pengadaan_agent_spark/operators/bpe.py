"""BPE merge induction — tokenizer training as a Spark plan.

Byte-Pair Encoding vocabulary learning (Sennrich, Haddow & Birch,
ACL 2016): repeatedly find the most frequent adjacent symbol pair in
the corpus and merge it. This is the TRAINING step of the tokenizer a
data pipeline ultimately feeds, and its distributed shape is classic:
the corpus collapses ONCE to a word-frequency table (vocab-sized —
pair statistics only need each distinct word and its count), then
every round is one vocab-sized pair-count aggregate, a 1-row argmax,
and a vocab-sized merge application. Nothing corpus-sized moves after
the first aggregate.

Cross-engine determinism is the interesting part. The merge
APPLICATION is a greedy left-to-right non-overlapping scan —
procedural at first sight — expressed as a FOLD over the symbol list
with a string accumulator ``"<out>\\x1f<carry>"`` (``\\x1e`` separates
emitted symbols): one shared CASE body, emitted into Spark's
``aggregate(...)`` and DuckDB's ``list_reduce(...)`` from the SAME
template (``merge_fold_sql``), so the two engines cannot drift — the
zorder_key_sql discipline. The argmax tie-break is
``min(struct(-count, x, y))`` (count DESC, then lexicographic pair),
bit-stable on both engines. The learned merge is never collected and
re-injected as a literal: each round's 1-row merge frame cross-joins
back in and the lambda references its columns, so quoting/escaping of
corpus-derived symbols can never corrupt the plan.

Separators: \\x1f (unit) and \\x1e (record) are control characters a
whitespace tokenizer cannot emit inside a token; a corpus that did
contain them would need remapping first (documented contract, same
class as zorder_key's normalize-before-masking)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the shared greedy-merge fold CASE body; placeholders:
#   {acc}/{s}: lambda variable names, {x}/{y}: merge-pair references,
#   {chr}: the dialect's chr/char function name
FOLD_CASE = (
    "CASE "
    "WHEN split_part({acc}, {chr}(31), 2) = '' "
    "THEN split_part({acc}, {chr}(31), 1) || {chr}(31) || {s} "
    "WHEN split_part({acc}, {chr}(31), 2) = {x} AND {s} = {y} "
    "THEN split_part({acc}, {chr}(31), 1) || {chr}(30) || {x} || {y} || {chr}(31) "
    "ELSE split_part({acc}, {chr}(31), 1) || {chr}(30) "
    "|| split_part({acc}, {chr}(31), 2) || {chr}(31) || {s} "
    "END"
)

# unwrap the final accumulator (flush the carry) and split back to a
# symbol list; {fold} is the fold expression, {filter}/{split} the
# dialect's higher-order filter / string-split functions
UNWRAP = (
    "{filter}({split}(CASE WHEN split_part({fold}, {chr}(31), 2) = '' "
    "THEN split_part({fold}, {chr}(31), 1) "
    "ELSE split_part({fold}, {chr}(31), 1) || {chr}(30) "
    "|| split_part({fold}, {chr}(31), 2) END, {chr}(30)), t -> t <> '')"
)


def merge_fold_sql(dialect: str, x_ref: str, y_ref: str, syms: str = "syms") -> str:
    """The whole apply-one-merge expression for ``dialect`` in
    {'spark', 'duckdb'}: fold + unwrap, referencing the merge pair as
    the column expressions ``x_ref``/``y_ref`` (never literals)."""
    if dialect == "spark":
        case = FOLD_CASE.format(acc="acc", s="s", x=x_ref, y=y_ref, chr="char")
        fold = f"aggregate({syms}, CAST(char(31) AS STRING), (acc, s) -> {case})"
        return UNWRAP.format(fold=fold, chr="char", filter="filter", split="split")
    if dialect == "duckdb":
        case = FOLD_CASE.format(acc="acc", s="s", x=x_ref, y=y_ref, chr="chr")
        fold = (
            f"list_reduce(list_prepend(CAST(chr(31) AS VARCHAR), {syms}), "
            f"(acc, s) -> {case})"
        )
        return UNWRAP.format(
            fold=fold, chr="chr", filter="list_filter", split="string_split"
        )
    raise ValueError(f"merge_fold_sql: unknown dialect {dialect!r}")


def word_frequencies(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The corpus collapse: (word, n) over the whitespace tokens —
    the only corpus-sized pass in BPE training."""
    from data_pengadaan_agent_spark.operators.textan import tokens
    from data_pengadaan_agent_spark.sources.catalog import spread

    return (
        spread(docs, id_col)
        .select(F.explode(tokens(text_col)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def learn_bpe_merges(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    return_vocab: bool = False,
) -> DataFrame:
    """Learn the first ``k`` BPE merges over the corpus; returns
    (rank, x, y, pair_count) — the merge table a tokenizer replays at
    encode time. ``k`` here is a demonstration scale (the oracle twin
    unrolls the same rounds as CTEs); a production 30k-merge trainer
    runs this exact loop, whose per-round cost is vocab-sized, with
    the pair-count aggregate incrementalized (only words containing
    the last merge change their pairs — a delta the same frames
    express).

    Rounds with no remaining pair (every word a single symbol) stop
    the loop early. Each round's merge frame is 1 row, eagerly
    checkpointed (cuts the unrolled lineage), cross-joined back so
    the fold references its columns — never re-injected literals.

    ``return_vocab=True`` returns the ENCODE-side product instead:
    the vocabulary after all k merges, (w, n, syms) — the trained
    tokenizer's segmentation of every distinct word, produced by the
    same loop with zero driver collection (the merge table never
    leaves the cluster)."""
    if k < 1:
        raise ValueError("learn_bpe_merges: k must be >= 1")
    vocab = word_frequencies(docs, text_col, id_col).withColumn(
        "syms", F.expr("transform(sequence(1, length(w)), i -> substr(w, i, 1))")
    ).localCheckpoint(eager=True)
    merges = []
    for rank in range(1, int(k) + 1):
        # guard single-symbol words BEFORE the pair transform: Spark's
        # sequence(0, -1) is DESCENDING ([0, -1] — a bogus (s0, null)
        # pair), not empty the way DuckDB's range(1, 1) is
        pairs = (
            vocab.filter(F.size("syms") >= 2)
            .select(
                F.expr(
                    "explode(transform(sequence(0, size(syms) - 2),"
                    " i -> struct(syms[i] AS x, syms[i + 1] AS y)))"
                ).alias("p"),
                "n",
            )
            .select("p.x", "p.y", "n")
            .groupBy("x", "y")
            .agg(F.sum("n").cast("bigint").alias("cnt"))
        )
        m = (
            pairs.agg(
                F.min(F.struct((-F.col("cnt")).alias("o"), "x", "y")).alias("m")
            )
            .select(
                F.col("m.x").alias("mx"),
                F.col("m.y").alias("my"),
                (-F.col("m.o")).cast("bigint").alias("mcnt"),
            )
            .filter(F.col("mx").isNotNull())
            .localCheckpoint(eager=True)
        )
        if m.isEmpty():
            break
        merges.append(
            m.select(
                F.lit(rank).cast("int").alias("rank"),
                F.col("mx").alias("x"),
                F.col("my").alias("y"),
                F.col("mcnt").alias("pair_count"),
            )
        )
        prev_vocab = vocab
        vocab = (
            vocab.crossJoin(F.broadcast(m))
            .withColumn("syms", F.expr(merge_fold_sql("spark", "mx", "my")))
            .drop("mx", "my", "mcnt")
            .localCheckpoint(eager=True)
        )
        # the new eager checkpoint fully consumed the old vocab —
        # release it (self-review r14): without this every merge round
        # pinned a full word-vocabulary copy for the session. The
        # 1-row `m` checkpoints stay — the final merge-table union
        # still reads them.
        from data_pengadaan_agent_spark.operators.graph import (
            _release_local_checkpoint,
        )

        _release_local_checkpoint(prev_vocab)
    if return_vocab:
        return vocab.select("w", "n", "syms")
    if not merges:
        # round 1 found no pair at all (e.g. every word is a single
        # character): the documented early stop, as an empty frame
        # with the contract schema rather than an IndexError
        return docs.sparkSession.createDataFrame(
            [], "rank int, x string, y string, pair_count bigint"
        )
    out = merges[0]
    for mdf in merges[1:]:
        out = out.unionByName(mdf)
    return out


def apply_bpe_merges(
    df: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "w",
) -> DataFrame:
    """Encode-side twin: segment ``word_col`` by replaying a learned
    merge list in rank order (the tokenizer's runtime path). Adds a
    ``syms`` array column. Merges are data here too, but the list is
    parameter-bounded (it IS the model), so folds chain statically."""
    out = df.withColumn(
        "syms",
        F.expr(f"transform(sequence(1, length({word_col})), i -> substr({word_col}, i, 1))"),
    )
    from data_pengadaan_agent_spark.sources.catalog import local_df

    for x, y in merges:
        m = local_df(df.sparkSession, [(x, y)], "mx string, my string")
        out = (
            out.crossJoin(F.broadcast(m))
            .withColumn("syms", F.expr(merge_fold_sql("spark", "mx", "my")))
            .drop("mx", "my")
        )
    return out
