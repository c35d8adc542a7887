"""Vector scalar functions (SURVEY.md §1.3, §2.8).

- ``parse_vector_string``: the reference hydrates embeddings from CSV
  as stringified float arrays, ``np.fromstring(x.strip('[]'), sep=',')``
  (openai/list_of_tools.py:128, langchain/my_toolkit.py:449). Here the
  same parse is a pure column expression (codegen'd, no Python).
- ``hash_ngram_embedding_col``: a deterministic hashing-trick text
  embedder (char-3-gram → signed bucket counts), the test stand-in for
  the reference's external embedding API (S6, text-embedding-3-large).
  Integer arithmetic end-to-end so an external SQL oracle reproduces
  it bit-exactly; a production embedder swaps in behind the same
  column-in/array-out contract.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMBED_DIM = 64


def parse_vector_string(col: Column | str, element_type: str = "float") -> Column:
    """'[0.1, -0.2, …]' → ARRAY<element_type>. NULL-safe: malformed
    numbers become NULL elements under try-semantics (ANSI mode)."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(F.trim(c), r"^\[|\]$", "")
    return F.transform(
        F.split(stripped, ","), lambda x: F.trim(x).try_cast(element_type)
    )


def _gram_hash(g: Column) -> Column:
    """Integer hash of one 3-char gram: o1*961 + o2*31 + o3."""
    return (
        F.ascii(F.substring(g, 1, 1)) * F.lit(961)
        + F.ascii(F.substring(g, 2, 1)) * F.lit(31)
        + F.ascii(F.substring(g, 3, 1))
    )


def hash_ngram_embedding_col(col: Column | str, dim: int = EMBED_DIM) -> Column:
    """Deterministic hashing-trick embedding as a pure column
    expression: pad with '##', take one 3-gram per character position,
    hash each gram, add ±1 (sign bit = (h/dim)%2) into bucket h%dim.
    Whole-stage-codegen'd; zero Python in the distributed path."""
    c = F.col(col) if isinstance(col, str) else col
    padded = F.concat(F.lower(c), F.lit("##"))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c), F.lit(1))),
        lambda i: F.substring(padded, i, 3),
    )
    hashes = F.transform(grams, _gram_hash)
    return F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), dim),
        lambda acc, h: F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda v, b: v
            + F.when(
                h % dim == b,
                F.when((h / F.lit(dim)).cast("int") % 2 == 0, F.lit(1)).otherwise(F.lit(-1)),
            ).otherwise(F.lit(0)),
        ),
    )


def hash_ngram_embed(text: str, dim: int = EMBED_DIM) -> list[float]:
    """Driver-side Python twin of ``hash_ngram_embedding_col`` — used
    to embed the query text (the reference embeds the user question
    with one API call; here one local computation). Same integer spec,
    so Spark/Python/SQL all agree exactly."""
    s = text.lower()
    padded = s + "##"
    vec = [0] * dim
    for i in range(max(len(s), 1)):
        g = padded[i : i + 3]
        # missing positions hash as 0, matching Spark's ascii('') = 0
        # (reachable only for the empty string, whose single gram is
        # the 2-char pad — g[2] used to IndexError where the column
        # expression returned a vector)
        o = [ord(ch) for ch in g] + [0, 0, 0]
        h = o[0] * 961 + o[1] * 31 + o[2]
        vec[h % dim] += 1 if (h // dim) % 2 == 0 else -1
    return [float(v) for v in vec]
