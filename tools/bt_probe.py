"""Micro-probe: time build_triples components at a given core count."""
import sys
import time

sys.path.insert(0, "/root/repo")
from tera_spark.fixtures.transcripts import lexicon_spark_df, transcripts_spark_df
from tera_spark.pipeline.extract import extract_mentions
from tera_spark.pipeline.kg import (
    build_triples,
    cooccurrence_triples,
    mention_triples,
    quantity_triples,
    transcript_structure_triples,
)
from tera_spark.pipeline.link import link_mentions
from tera_spark.session import get_spark

cores = int(sys.argv[1])
spark = get_spark("bt", cores=cores, shuffle_partitions=cores)
transcripts = transcripts_spark_df(spark, n_convs=6000).cache()
transcripts.count()
lexicon = lexicon_spark_df(spark)
mentions = extract_mentions(transcripts)
linked, _ = link_mentions(mentions, lexicon)
linked = linked.cache()
linked.count()


def noop(df, label):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    print(label, round(time.time() - t0, 1), flush=True)


noop(transcript_structure_triples(transcripts), "structure")
noop(mention_triples(linked), "mention_t")
noop(quantity_triples(linked), "quantity_t")
noop(cooccurrence_triples(linked), "cooccur_t")
noop(build_triples(transcripts, linked), "build_all")
noop(build_triples(transcripts, linked), "build_all2")
