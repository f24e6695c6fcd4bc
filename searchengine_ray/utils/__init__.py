from searchengine_ray.utils.urls import (  # noqa: F401
    get_urlhash,
    is_valid,
    normalize,
    parse_url,
    urldefrag_str,
)
