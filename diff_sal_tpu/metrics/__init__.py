from diff_sal_tpu.metrics.saliency import (  # noqa: F401
    AUC_Borji,
    AUC_Judd,
    AUC_shuffled,
    CC,
    NSS,
    SIM,
    normalize_map,
)
