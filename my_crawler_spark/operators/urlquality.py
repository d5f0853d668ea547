"""RefinedWeb-style URL quality filtering (Penedo et al. 2023 §3.1).

RefinedWeb gates documents BEFORE fetching/processing their content using
only the URL: (1) a curated blocklist of ~4.6M fraudulent/adult domains,
(2) a soft word-weight score over URL substrings, (3) structural gates
(here: binary-file extensions, reusing the crawler's own predicate). This
is the cheapest filter in a 100 TB pipeline — it prunes rows on a few
string columns with zero content reads, so it runs first.

Plan shape: the blocklist is a DOMAIN TABLE joined in (broadcast — even the
real 4.6M-domain list is ~100 MB; past that, flip to a shuffle join on
`domain`), the word score is a pure column expression over a fixed lexicon
(codegen, zero shuffle), and the whole operator is one narrow projection +
one broadcast join — no UDFs, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.url import looks_like_file_url, url_host

# fixture lexicon (the production list is a config artifact): substring -> weight
DEFAULT_URL_WORD_WEIGHTS = {
    "login": 0.6,
    "signup": 0.6,
    "files": 0.4,
    "utm": 0.2,
    "blog": 0.1,
}


def url_spam_score(url, weights: dict[str, float] | None = None):
    """Soft score: sum of weights of lexicon words contained in the URL
    (lowercased substring containment, RefinedWeb's soft-url-score shape).
    Rounded to 2dp so the fixed-precision weights stay cross-engine exact."""
    weights = DEFAULT_URL_WORD_WEIGHTS if weights is None else weights
    low = F.lower(url)
    score = F.lit(0.0)
    for word, wt in weights.items():
        score = score + F.when(low.contains(word), F.lit(float(wt))).otherwise(
            F.lit(0.0)
        )
    return F.round(score, 2)


def url_quality(
    urls: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    weights: dict[str, float] | None = None,
    score_threshold: float = 0.5,
) -> DataFrame:
    """Adds (domain, blocked, url_score, keep) to `urls`.

    `blocklist` is a 1-column (domain) DataFrame; keep = not blocklisted AND
    url_score < threshold AND not a binary-file URL.
    """
    u = urls.withColumn("domain", url_host(F.col(url_col)))
    b = blocklist.select(F.col("domain"), F.lit(True).alias("blocked"))
    joined = u.join(F.broadcast(b), "domain", "left").withColumn(
        "blocked", F.coalesce(F.col("blocked"), F.lit(False))
    )
    return joined.withColumn(
        "url_score", url_spam_score(F.col(url_col), weights)
    ).withColumn(
        "keep",
        ~F.col("blocked")
        & (F.col("url_score") < F.lit(float(score_threshold)))
        & ~looks_like_file_url(F.col(url_col)),
    )
