package graft

/** Committed content-hash goldens for [[GoldenHashes]] — (sf-dir
  * basename, query name, md5) triples. Regenerated via
  * `SPARK_GRAFT_GOLDEN_WRITE=1` (see GoldenHashes scaladoc); a diff in
  * this file IS the review surface for an intended value change to a
  * production hash path. */
object GoldenHashesData {
  val triples: Seq[(String, String, String)] = Seq(
    // baseline JPEG decode features (DCT codec — no SQL oracle; the
    // byte-exact fixture + numpy worker twin carry the value proof)
    // IMA-ADPCM speech WAV decode (stateful nibble chain — audioop
    // differential + worker-twin parity carry the value proof)
    ("sf0.001", "mm_audio_adpcm", "df42425c2abd95e7ca2009f27fba4312"),
    ("sf0.01", "mm_audio_adpcm", "d62be2c5b923c82e9c59d65d0550eb11"),
    ("sf0.1", "mm_audio_adpcm", "ba5f1be3fb8887eda32739571e2582b0"),
    // Motion-JPEG AVI decode (same DCT class, per-frame; worker twin +
    // byte-exact frame equality with Jpeg.decode carry the value proof)
    ("sf0.001", "mm_video_mjpeg", "28bf268e883c7826affac8d3221f2c2b"),
    ("sf0.01", "mm_video_mjpeg", "e13c924c1ac317e076d47a5fbe108140"),
    ("sf0.1", "mm_video_mjpeg", "8c8946c63dff6072894ba0c75f61513d"),
    ("sf0.001", "mm_features_jpeg", "692f07167232564d1c2f27d3c7240fef"),
    ("sf0.01", "mm_features_jpeg", "92a996b0158695030148005a28387295"),
    ("sf0.1", "mm_features_jpeg", "6d6b212f6e23b4bd1ef82cfe1bd9613f"),
    ("sf0.001", "sim_ivfpq_topk", "8cba6e29e3180bd5f4f0b7042181b558"),
    ("sf0.01", "sim_ivfpq_topk", "a4411a350e362793ab04ca8132e252d0"),
    ("sf0.1", "sim_ivfpq_topk", "b1de463dfd9ccbad2099868f167ae078"),
    // sim_ivfpq_serve replays the same models — identical hashes by
    // construction (see GoldenHashes.queries)
    ("sf0.001", "sim_ivfpq_serve", "8cba6e29e3180bd5f4f0b7042181b558"),
    ("sf0.01", "sim_ivfpq_serve", "a4411a350e362793ab04ca8132e252d0"),
    ("sf0.1", "sim_ivfpq_serve", "b1de463dfd9ccbad2099868f167ae078"),
    ("sf0.001", "text_unigram_tok", "6bcf4dac23afd43c63d955c0eb8fc61d"),
    ("sf0.01", "text_unigram_tok", "8f84527e156911bcf545c709b31d4284"),
    ("sf0.1", "text_unigram_tok", "794edc5a9d2f8be2852171191d077640"),
    ("sf0.001", "text_pack_bpe", "f304cd8738bb47a9052eb0533c0305b6"),
    ("sf0.01", "text_pack_bpe", "db1b0a648277636cb041639628c85d62"),
    ("sf0.1", "text_pack_bpe", "39d9c39f94f334aa91bcf9a415e16c57"),
    ("sf0.001", "text_bpe", "010b64ddb88539a4ef5f7e422e9cbf06"),
    ("sf0.01", "text_bpe", "73d47edebe6e28b08e9860367ae54ef1"),
    ("sf0.1", "text_bpe", "db03615af5baf39e7cd5d113f084db36"),
    ("sf0.001", "pipeline_curate", "65b0abf3bea444b8f1dec026da959de6"),
    ("sf0.01", "pipeline_curate", "eacd9b1806eca758dda26fedecf2d8a7"),
    ("sf0.1", "pipeline_curate", "4c084ad82d789823ded2084ee0db61c0"),
    ("sf0.001", "a14_approx_distinct", "dceba3dac8202eacfb0af014ab2a73f0"),
    ("sf0.001", "dedup_minhash_lsh", "a53e915a26d81bb3ae2f4fe40687b7a4"),
    ("sf0.001", "dedup_minhash_sigs", "068b0367e2d101b32e53e5fd6f0d0031"),
    ("sf0.001", "dedup_simhash", "e9eedbb87ec8423080f5df8dc3937ee2"),
    ("sf0.001", "dedup_simhash_pairs", "4f9e0d29be0d9a2a424df4be5b61ae94"),
    ("sf0.001", "sim_ivf_topk", "2a54152af1b16ace74c0f5af4f68ef17"),
    ("sf0.001", "sim_lsh_topk", "6ae861367de0a613ef220a26748db03d"),
    ("sf0.01", "a14_approx_distinct", "46ae2a261d5fa445c1ee8f9077e4df26"),
    ("sf0.01", "dedup_minhash_lsh", "b3b86ed8792a40cfadab4bce1f25da46"),
    ("sf0.01", "dedup_minhash_sigs", "5df158cc84548150bd2580fdc8c69962"),
    ("sf0.01", "dedup_simhash", "ea409a19370629dbade0055795688d5b"),
    ("sf0.01", "dedup_simhash_pairs", "518ad83e5709833b555a47285db0511a"),
    ("sf0.01", "sim_ivf_topk", "b309364c2c078aad72dec2ceb6b3131e"),
    ("sf0.01", "sim_lsh_topk", "3e5b9275ca69843042819eb005299ba1"),
    ("sf0.1", "a14_approx_distinct", "0b783501bca7f31f2a9747d74bac72f3"),
    ("sf0.1", "dedup_minhash_lsh", "d5c3281dbaeaaddd0fac00ad3c96cd7e"),
    ("sf0.1", "dedup_minhash_sigs", "2fe7fe2bde48b48c1349f899fccdf856"),
    ("sf0.1", "dedup_simhash", "40bd43af0c260c15c6547513e9e0e375"),
    ("sf0.1", "dedup_simhash_pairs", "5d4225f917bdb622c44f4b0d06e4fd65"),
    ("sf0.1", "sim_ivf_topk", "fab7b90cda8614ae22d5e0d0fcf42e92"),
    ("sf0.1", "sim_lsh_topk", "91f12ee1e2929b1cee2e7a1c8e7dae55"),
    ("sf0.001", "text_decontaminate_fuzzy", "2bf306ccb419d1d315f34740c3bcb16e"),
    ("sf0.01", "text_decontaminate_fuzzy", "4896bb33427fa4e484bc035af71fbfe3"),
    ("sf0.1", "text_decontaminate_fuzzy", "f2bbacbe97a377ae9fc52efd53317954"),
    ("sf0.001", "text_compression", "d20f73bcd2266530b59cc5959e72c865"),
    ("sf0.01", "text_compression", "6ca0aa006990c266c680d15f2d44e39a"),
    ("sf0.1", "text_compression", "efb031e5e6c1574b20f0085f7a0678d9"))
}
