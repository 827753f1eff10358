import numpy as np, pyarrow as pa

def test_diag():
    from logtrics_ray.functions.dedup import (gram_hash_flat, ngram_set,
                                              unique_grams_per_doc, split_words)
    from logtrics_ray.hashing import hash64_array
    texts=['\x80\x80','\x80\x80','\x80࠰𐄀','00000\x80\x80\x80\x80\x80\x80','000\x80\x80\x80 ']
    n=1
    kept, wc = split_words(pa.array(texts, pa.string()))
    print("WC:", wc, "KEPT:", [repr(k) for k in kept.to_pylist()])
    h, gd, nd = gram_hash_flat(pa.array(texts, pa.string()), n)
    uh, cnt = unique_grams_per_doc(h, gd, nd)
    ref=[np.unique(hash64_array(sorted(ngram_set(s,n)))) if s.strip() else np.empty(0,np.uint64) for s in texts]
    off=np.concatenate([[0],np.cumsum(cnt)]).astype(np.int64)
    for i,r in enumerate(ref):
        got = uh[off[i]:off[i+1]]
        assert np.array_equal(got, r), (i, repr(texts[i]), r, got)
