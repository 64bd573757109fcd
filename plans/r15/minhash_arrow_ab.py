import sys, time, numpy as np
sys.path.insert(0,"/root/repo")
np.seterr(over='ignore')
from amonaly_detection_in_time_series_data_spark.session import get_spark
from amonaly_detection_in_time_series_data_spark.sources.readers import load_table, spread_small
from amonaly_detection_in_time_series_data_spark.functions.text import tokenize
from amonaly_detection_in_time_series_data_spark.operators.similarity import (
    minhash_signatures, minhash_lsh_pairs, shingle_hashes_from_token_hashes)
from pyspark.sql import functions as F
import pyarrow as pa

spark=get_spark(app_name="minhash-ab")
sf="/root/testdata/sf0.1"

def docs_with_dups():
    docs = load_table(spark, sf, "documents")
    dup = docs.filter(F.col("doc_id") % 10 == 0).withColumn("doc_id", F.col("doc_id") + 10000)
    return docs.unionByName(dup)

def noop(df): df.write.format("noop").mode("overwrite").save()

def timeit(label, fn, reps=5):
    walls=[]
    for _ in range(reps):
        t0=time.perf_counter(); fn(); walls.append(time.perf_counter()-t0)
    walls.sort()
    print(f"{label:34s} med={walls[len(walls)//2]:.3f} best={walls[0]:.3f}")
    return walls[len(walls)//2]

# ---------- Arrow sig implementation ----------
P1=np.uint64(0x9E3779B185EBCA87); P2=np.uint64(0xC2B2AE3D27D4EB4F); P3=np.uint64(0x165667B19E3779F9)
P4=np.uint64(0x85EBCA77C2B2AE63); P5=np.uint64(0x27D4EB2F165667C5)
U64=np.uint64
def _rotl(x,r): r=U64(r); return (x<<r)|(x>>(U64(64)-r))
def _fmix(h):
    h=h^(h>>U64(33)); h=h*P2; h=h^(h>>U64(29)); h=h*P3; h=h^(h>>U64(32)); return h
def _hl(x,seed):
    h=seed+P5+U64(8)
    h=h^(_rotl(x*P2,31)*P1)
    h=_rotl(h,27)*P1+P4
    return _fmix(h)
def _hi(i,seed):
    h=seed+P5+U64(4)
    h=h^(U64(i&0xFFFFFFFF)*P1)
    h=_rotl(h,23)*P2+P3
    return _fmix(h)
SEED=U64(42)

def make_sig_fn(n_hashes, n):
    seeds=[U64(_hi(i,SEED)) for i in range(n_hashes)]
    def fn(batches):
        for b in batches:
            ids = b.column(0)
            lst = b.column(1)
            off = np.asarray(lst.offsets)
            base = off[0]
            v = np.asarray(lst.values)[base:off[-1]].view(np.uint64) if off[-1]>base else np.empty(0,np.uint64)
            off = (off - base).astype(np.int64)
            counts = off[1:]-off[:-1]
            D = len(counts)
            if D==0:
                continue
            # grams: fold of n consecutive token hashes, JVM composition order
            if len(v)>=n:
                acc=_hl(v[:len(v)-n+1], SEED)
                for j in range(1,n):
                    nxt=v[j:len(v)-n+1+j]
                    acc=_hl(nxt,acc)
                    if j<n-1: acc=_hl(acc,SEED)
                g_full=acc  # len N-n+1
            else:
                g_full=np.empty(0,np.uint64)
            gcounts=np.maximum(counts-(n-1),0)
            # valid gram flat positions: off[d] .. off[d]+gcounts[d]-1
            keep=gcounts>0
            if not keep.any():
                continue
            starts=off[:-1][keep]; lens=gcounts[keep]
            idx=np.repeat(starts+lens-lens.cumsum(),lens)+np.arange(lens.sum())
            grams=g_full[idx]
            gstarts=np.zeros(len(lens),np.int64); np.cumsum(lens[:-1],out=gstarts[1:])
            sigs=np.empty((len(lens),n_hashes),np.int64)
            for i,s in enumerate(seeds):
                hs=_hl(grams,s).view(np.int64)
                sigs[:,i]=np.minimum.reduceat(hs,gstarts)
            out_ids=ids.take(pa.array(np.flatnonzero(keep)))
            sig_arr=pa.FixedSizeListArray.from_arrays(pa.array(sigs.reshape(-1),type=pa.int64()),n_hashes).cast(pa.list_(pa.int64()))
            yield pa.RecordBatch.from_arrays([out_ids,sig_arr],["doc_id","sig"])
    return fn

def minhash_sigs_arrow(df,text_col,id_col,n_hashes,shingle_n):
    tok=df.select(
        F.col(id_col),
        F.coalesce(F.transform(tokenize(F.col(text_col)),lambda t:F.xxhash64(t)),F.array().cast("array<bigint>")).alias("__tok_h"),
    )
    return tok.mapInArrow(make_sig_fn(n_hashes,shingle_n),f"{id_col} long, sig array<bigint>")

# hmm: tokenize(text) evaluated once per row? transform input evaluated once. ok.

docs = spread_small(docs_with_dups())

# equality check at sf0.1
cur = minhash_signatures(docs,"text","doc_id",n_hashes=16,shingle_n=3)
new = minhash_sigs_arrow(docs,"text","doc_id",16,3)
a = {r.doc_id: list(r.sig) for r in cur.collect()}
bb = {r.doc_id: list(r.sig) for r in new.collect()}
print("sig rows:", len(a), len(bb), "EQUAL:", a==bb)

# decomposition timings (interleaved)
toks_only = docs.select("doc_id", F.transform(tokenize(F.col("text")),lambda t:F.xxhash64(t)).alias("__tok_h"))
def arrow_passthrough(batches):
    for b in batches: yield b
passthru = toks_only.mapInArrow(arrow_passthrough, "doc_id long, __tok_h array<bigint>")

full_cur = minhash_lsh_pairs(cur, n_bands=4, id_col="doc_id")
full_new = minhash_lsh_pairs(new, n_bands=4, id_col="doc_id")

for rnd in range(2):
    timeit("tokenize+tok_h only", lambda: noop(toks_only))
    timeit("arrow passthrough", lambda: noop(passthru))
    timeit("sigs current (HOF fold)", lambda: noop(cur))
    timeit("sigs arrow", lambda: noop(new))
    timeit("pairs current (full)", lambda: noop(full_cur))
    timeit("pairs arrow (full)", lambda: noop(full_new))
    print("---")
spark.stop()
