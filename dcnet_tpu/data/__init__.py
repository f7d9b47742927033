from dcnet_tpu.data.corpus import Corpus, load_reference_corpus
