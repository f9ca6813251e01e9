from .text import normalize_text, text_filter, tokens, url_site  # noqa: F401
from .lookups import CAMEO_ROOT, EVENT_TYPE_DIM, event_type_dim_df  # noqa: F401
