"""Large-scale pipeline operators (beyond the reference's surface).

- dedup: exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding near-dup
- similarity: exact cosine top-k, LSH-bucketed ANN
- text: tokenization, quality scoring, language ID, fingerprinting
- multimodal: binary payload plumbing with stubbed codecs
"""

from . import dedup, multimodal, similarity, text

__all__ = ["dedup", "multimodal", "similarity", "text"]
