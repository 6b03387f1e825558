"""map_batches stages: rollup kernels, windows, gap-fill, codecs, dedup,
text, similarity, multimodal, joins, predictors, skew mitigation."""

from .dedup import (  # noqa: F401
    cosine_neardup_exact,
    cosine_neardup_lsh,
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from .gapfill import GapFiller, gapfill  # noqa: F401
from .groupby import grouped_sums  # noqa: F401
from .joins import (  # noqa: F401
    broadcast_join,
    hash_join,
    hash_split,
    semi_join_filter,
    time_split,
)
from .predictors import (  # noqa: F401
    LinearRegression,
    LogisticRegression,
    StandardScaler,
    XGBoostPredictor,
    auc,
    classification_metrics,
    regression_metrics,
    select_features,
)
from .preprocessors import (  # noqa: F401
    CategoryTrimmer,
    EMailDomain,
    Imputation,
    Seasonal,
    Substring,
    TextFieldSplitter,
    group_count,
)
from .similarity import brute_force_topk, ivf_topk  # noqa: F401
from .skew import salted_group_count  # noqa: F401
from .text import LangId, fingerprint, quality_scores, token_count_bpe, token_stats  # noqa: F401
from .windows import window_features  # noqa: F401
