"""Operator library — the ``variation6``-equivalent surface.

Module map to the reference inventory (SURVEY.md §2.1):

- ``stats``       axis reductions C1-C11 (rates, category counts/shares,
                  major/minor frequency, heterozygosity, moments, histogram)
- ``filters``     predicate operators D1-D9 with kept/filtered accounting
- ``transforms``  row-wise transforms B3-B6 (masking, recode, subsetting)
- ``asof``        as-of join (extension; union+window, single shuffle)
- ``sessionize``  gaps-and-islands sessionization (extension)
- ``dedup``       exact + MinHash-LSH + SimHash + n-gram Jaccard +
                  embedding near-dup (north-star extension)
- ``similarity``  cosine top-k: brute-force and LSH-bucketed ANN
- ``text``        language-ID, quality scoring, token stats, fingerprints
- ``multimodal``  binary media columns: schema + Arrow-batched UDF plumbing
"""
