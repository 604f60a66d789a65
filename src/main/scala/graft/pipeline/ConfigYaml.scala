package graft.pipeline

/** Reference-shaped YAML pipeline configs
  * (reference examples/configs/example.yaml:1-31, sdata/dataset.py:124-256,
  * sdata/datapipeline.py:310-325): accepts the same `dataset:` document a
  * reference user runs today and builds the [[PipelineConfig]] the engine
  * executes. `target:` dotted paths are translated to [[OperatorRegistry]]
  * names — the registry replaces the reference's arbitrary-import
  * `instantiate` machinery, so only known operators resolve.
  */
object ConfigYaml {

  /** Parsed document: the pipeline config plus the loader-edge settings
    * (reference example.yaml:29-31).
    */
  final case class Loaded(config: PipelineConfig, batchSize: Option[Int])

  def parse(text: String): Loaded = {
    val root = asMap(MiniYaml.parse(text), "document root")
    val ds = root.get("dataset").map(asMap(_, "dataset")).getOrElse(root)

    val urls = ds.get("urls") match {
      case Some(l: List[_]) => l.map(_.toString)
      case Some(s: String) => Seq(s)
      case _ => sys.error("yaml config requires dataset.urls")
    }
    val pc = ds.get("pipeline_config").map(asMap(_, "pipeline_config"))
      .getOrElse(Map.empty[String, Any])

    // deterministic dual of the reference's global-RNG shuffles: buffer
    // sizes > 1 arm the seeded shuffle (seed from pipeline_config.seed,
    // default 0); buffer size <= 1 means off, as in the reference
    // (datapipeline.py:333-334).
    val seed = int(pc.get("seed")).getOrElse(0)
    val shardShuffleOn = int(pc.get("shardshuffle")).exists(_ > 1)
    val sampleShuffleOn = int(pc.get("sample_shuffle")).exists(_ > 1)

    // resample_prefixes + prefix_probs (datapipeline.py:318-319): probs
    // align with the urls list by position; our exact-count mixture
    // needs an explicit total (the reference resamples a stream forever
    // — a batch engine must bound the draw).
    val resample = pc.get("resample_prefixes").exists {
      case b: java.lang.Boolean => b.booleanValue()
      case other => other.toString.toBoolean
    }
    val prefixProbs: Map[String, Double] =
      if (!resample) Map.empty
      else pc.get("prefix_probs") match {
        case Some(l: List[_]) =>
          require(l.length == urls.length,
            s"prefix_probs has ${l.length} entries for ${urls.length} urls")
          urls.zip(l.map(v => num(v))).toMap
        case _ => sys.error("resample_prefixes: true requires prefix_probs")
      }
    val mixtureTotal = int(pc.get("mixture_total")).map(_.toLong).getOrElse(0L)
    if (prefixProbs.nonEmpty)
      require(mixtureTotal > 0,
        "resample_prefixes needs pipeline_config.mixture_total (the exact-count " +
          "mixture draws a bounded sample; the reference resamples an unbounded stream)")

    // handler target (dataset.py:154-155 defaults to warn_and_continue)
    val skipCorrupt = ds.get("error_handler").orElse(pc.get("handler")) match {
      case Some(m: Map[_, _]) =>
        m.asInstanceOf[Map[String, Any]].get("target")
          .exists(_.toString.endsWith("warn_and_continue"))
      case Some(s: String) => s.endsWith("warn_and_continue")
      case None => true // the reference's default
    }

    val decoders = ds.get("decoders") match {
      case Some(l: List[_]) => Decoders.withSpecs(l.map(_.toString), Map.empty)
      case Some(s: String) => Decoders.withSpecs(Seq(s), Map.empty)
      case None => Decoders.defaults
    }

    val config = PipelineConfig(
      urls = urls,
      extensions = ds.get("extensions") match {
        case Some(l: List[_]) => l.map(_.toString)
        case _ => sys.error(
          "yaml config requires dataset.extensions (the engine declares member " +
            "columns up front; wds-style inference would hide schema errors)")
      },
      metaSuffixes = ds.get("meta_urls") match {
        case Some(l: List[_]) => metaSuffixesOf(urls, l.map(_.toString))
        case _ => Nil
      },
      shardShuffleSeed = if (shardShuffleOn) Some(seed) else None,
      prefixProbs = prefixProbs,
      mixtureTotal = mixtureTotal,
      repeat = int(pc.get("repeat")).getOrElse(1),
      sampleShuffleSeed = if (sampleShuffleOn) Some(seed) else None,
      skipCorrupt = skipCorrupt,
      decoders = decoders,
      preprocessors = stages(ds.get("preprocessors")),
      postprocessors = stages(ds.get("postprocessors")),
      // graft-native knobs (no reference dual — the reference's meta zip
      // is always positional and its worker split is the task unit):
      // 'zip' selects the in-reader aligned co-iteration, 'shuffle'
      // (default) the order-independent join; max_partition_bytes packs
      // small shards under the byte budget (WdsTarSource.packShards)
      metaJoin = pc.get("meta_join").map(_.toString).getOrElse("shuffle"),
      maxPartitionBytes = long(pc.get("max_partition_bytes")))

    val batchSize = root.get("loader").map(asMap(_, "loader"))
      .flatMap(m => int(m.get("batch_size")))
    Loaded(config, batchSize)
  }

  /** meta_urls must be main urls + `_suffix` (the layout
    * ShardListing.metaDir produces); extract the suffixes.
    */
  private def metaSuffixesOf(urls: Seq[String], metaUrls: Seq[String]): Seq[String] =
    metaUrls.map { mu =>
      urls.collectFirst {
        case u if mu.startsWith(u + "_") => mu.drop(u.length + 1)
      }.getOrElse(sys.error(
        s"meta url '$mu' is not '<main url>_<suffix>' for any main url; " +
          "the engine derives metadata dirs by suffix (ShardListing.metaDir)"))
    }.distinct

  /** `target:` dotted path → registry stage. Reference class names map
    * to first-party operators; bare names fall through to the registry
    * (graft-native configs).
    */
  private def stages(node: Option[Any]): Seq[PipelineStage] = node match {
    case Some(l: List[_]) => l.map {
      case m: Map[_, _] => stageOf(m.asInstanceOf[Map[String, Any]])
      case s: String => FilterStage(OperatorRegistry.filter(s))
      case other => sys.error(s"invalid processor entry: $other")
    }
    case _ => Nil
  }

  private def stageOf(m: Map[String, Any]): PipelineStage = {
    val target = m.get("target").map(_.toString)
      .getOrElse(sys.error(s"processor entry needs 'target': $m"))
    val params = m.get("params").map(asMap(_, "params"))
      .getOrElse(Map.empty[String, Any])
    def str(k: String): Option[String] = params.get(k).map(_.toString)
    target.split('.').last match {
      case "Rescaler" =>
        MapperStage(OperatorRegistry.mapper("rescaler",
          Map("key" -> str("key").getOrElse("jpg")) ++
            str("isfloat").map("isfloat" -> _)))
      case "AddOriginalImageSizeAsTupleAndCropToSquare" =>
        MapperStage(OperatorRegistry.mapper("crop_to_square",
          Map("height_key" -> str("h_key").getOrElse("height"),
            "width_key" -> str("w_key").getOrElse("width"))))
      case "TorchVisionImageTransforms" =>
        MapperStage(OperatorRegistry.mapper("image_transforms",
          torchvisionParams(params)))
      case "SimpleKeyFilter" =>
        FilterStage(OperatorRegistry.filter("simple_key_filter",
          Map("keys" -> (params.get("keys") match {
            case Some(l: List[_]) => l.map(_.toString).mkString(",")
            case Some(s) => s.toString
            case None => sys.error("SimpleKeyFilter needs 'keys'")
          }))))
      case "SimpleSizeFilter" =>
        FilterStage(OperatorRegistry.filter("simple_size_filter",
          params.map { case (k, v) => k -> v.toString }))
      case name if m.contains("filter") || target.contains("filters") =>
        FilterStage(OperatorRegistry.filter(snake(name),
          params.map { case (k, v) => k -> v.toString }))
      case name =>
        MapperStage(OperatorRegistry.mapper(snake(name),
          params.map { case (k, v) => k -> v.toString }))
    }
  }

  /** Flatten the torchvision transforms chain (example.yaml:16-22) into
    * image_transforms params: Resize → resize (+interpolation),
    * RandomCrop → random_crop, CenterCrop → center_crop,
    * RandomHorizontalFlip → hflip_p, Normalize → normalize_mean/std,
    * ToTensor → chw layout.
    *
    * Fail-fast guarantees: an unsupported transform, an unrecognized
    * transform param, or a chain whose order differs from the canonical
    * resize → crop → flip → ToTensor → normalize application order all
    * raise — a config must never run with part of its meaning dropped
    * (the reference hands params straight to torchvision, so anything we
    * can't honor must be an error, not a silent default).
    */
  private def torchvisionParams(params: Map[String, Any]): Map[String, String] = {
    val key = params.get("key").map(_.toString).getOrElse("jpg")
    val transforms = params.get("transforms") match {
      case Some(l: List[_]) => l.map(asMap(_, "transform"))
      case _ => Nil
    }
    // one transform → (canonical rank, params to merge)
    def one(t: Map[String, Any]): (Int, Map[String, String]) = {
      val name = t.get("target").map(_.toString.split('.').last)
        .getOrElse(sys.error(s"transform entry needs 'target': $t"))
      val tp = t.get("params").map(asMap(_, "transform params"))
        .getOrElse(Map.empty[String, Any])
      def only(allowed: String*): Unit = {
        val unknown = tp.keySet -- allowed.toSet
        if (unknown.nonEmpty) sys.error(
          s"unsupported $name param(s): ${unknown.toSeq.sorted.mkString(", ")} " +
            s"(supported: ${allowed.mkString(", ")})")
      }
      def size: Int = int(tp.get("size")).getOrElse(
        sys.error(s"$name needs integer 'size'"))
      def nums(k: String): String = tp.get(k) match {
        case Some(l: List[_]) => l.map(num).mkString(",")
        case Some(v) => num(v).toString
        case None => sys.error(s"Normalize needs '$k'")
      }
      // scalar-or-[lo,hi] range in torchvision's normalization: scalar v
      // means [max(0,1-v), 1+v] (or [-v, v] when `centered`)
      def jitterRange(k: String, centered: Boolean): Option[String] =
        tp.get(k).map {
          case l: List[_] if l.length == 2 => l.map(num).mkString(",")
          case v =>
            val d = num(v)
            if (centered) s"${-d},$d" else s"${math.max(0.0, 1 - d)},${1 + d}"
        }
      name match {
        case "Resize" =>
          only("size", "interpolation")
          (10, Map("resize" -> size.toString) ++
            tp.get("interpolation").map { v =>
              val s = v.toString
              // validate eagerly so a bad code fails at config load
              graft.functions.ImageCodec.Interp.parse(s)
              "interpolation" -> s
            })
        case "RandomResizedCrop" =>
          only("size", "scale", "ratio", "interpolation")
          def range(k: String): Option[(String, String)] = tp.get(k) match {
            case Some(l: List[_]) if l.length == 2 =>
              Some(s"rrc_$k" -> l.map(num).mkString(","))
            case Some(other) => sys.error(s"RandomResizedCrop $k needs [lo, hi], got $other")
            case None => None
          }
          // torchvision's RandomResizedCrop defaults to bilinear (code 2);
          // namespaced so a sibling Resize's interpolation stays its own
          val rrcInterp = tp.get("interpolation").map(_.toString).getOrElse("2")
          graft.functions.ImageCodec.Interp.parse(rrcInterp)
          (0, Map("random_resized_crop" -> size.toString,
            "rrc_interpolation" -> rrcInterp) ++
            range("scale") ++ range("ratio"))
        case "Pad" =>
          only("padding", "fill", "padding_mode")
          tp.get("padding_mode").map(_.toString).foreach(m =>
            if (m != "constant") sys.error(s"Pad padding_mode '$m' not supported (constant only)"))
          val pad = tp.get("padding") match {
            case Some(l: List[_]) if l.length == 2 || l.length == 4 =>
              l.map(v => num(v).toInt).mkString(",")
            case Some(v) => num(v).toInt.toString
            case None => sys.error("Pad needs 'padding'")
          }
          (20, Map("pad" -> pad) ++
            tp.get("fill").map(v => "pad_fill" -> num(v).toString))
        case "RandomRotation" =>
          only("degrees", "interpolation", "fill")
          val degrees = tp.get("degrees") match {
            case Some(l: List[_]) if l.length == 2 => l.map(num).mkString(",")
            case Some(v) => val d = num(v); s"${-d},$d"
            case None => sys.error("RandomRotation needs 'degrees'")
          }
          val rotInterp = tp.get("interpolation").map(_.toString).map {
            case s @ ("0" | "2") => s
            case other => sys.error(
              s"RandomRotation interpolation supports 0 (nearest) and 2 (bilinear), got $other")
          }
          (30, Map("rotation" -> degrees) ++
            rotInterp.map("rotation_interpolation" -> _) ++
            tp.get("fill").map(v => "rotation_fill" -> num(v).toString))
        case "RandomAffine" =>
          only("degrees", "translate", "scale", "shear", "interpolation", "fill")
          val degrees = tp.get("degrees") match {
            case Some(l: List[_]) if l.length == 2 => l.map(num).mkString(",")
            case Some(v) => val dd = num(v); s"${-dd},$dd"
            case None => sys.error("RandomAffine needs 'degrees'")
          }
          def two(k: String): Option[(String, String)] = tp.get(k) match {
            case Some(l: List[_]) if l.length == 2 =>
              Some(s"affine_$k" -> l.map(num).mkString(","))
            case Some(other) => sys.error(s"RandomAffine $k needs [a, b], got $other")
            case None => None
          }
          val shearP = tp.get("shear").map {
            case l: List[_] if l.length == 2 || l.length == 4 =>
              "affine_shear" -> l.map(num).mkString(",")
            case v => "affine_shear" -> num(v).toString
          }
          val affInterp = tp.get("interpolation").map(_.toString).map {
            case s @ ("0" | "2") => "affine_interpolation" -> s
            case other => sys.error(
              s"RandomAffine interpolation supports 0 (nearest) and 2 (bilinear), got $other")
          }
          (35, Map("affine_degrees" -> degrees) ++
            two("translate") ++ two("scale") ++ shearP ++ affInterp ++
            tp.get("fill").map(v => "affine_fill" -> num(v).toString))
        case "RandomCrop" => only("size"); (40, Map("random_crop" -> size.toString))
        case "CenterCrop" => only("size"); (50, Map("center_crop" -> size.toString))
        case "RandomHorizontalFlip" =>
          only("p")
          (60, Map("hflip_p" -> tp.get("p").map(num(_).toString).getOrElse("0.5")))
        case "ColorJitter" =>
          only("brightness", "contrast", "saturation", "hue")
          val cj = Seq(
            jitterRange("brightness", centered = false).map("cj_brightness" -> _),
            jitterRange("contrast", centered = false).map("cj_contrast" -> _),
            jitterRange("saturation", centered = false).map("cj_saturation" -> _),
            jitterRange("hue", centered = true).map("cj_hue" -> _)).flatten
          if (cj.isEmpty) sys.error(
            "ColorJitter needs at least one of brightness/contrast/saturation/hue")
          (70, cj.toMap)
        case "GaussianBlur" =>
          only("kernel_size", "sigma")
          val ks = tp.get("kernel_size") match {
            case Some(l: List[_]) if l.length == 2 =>
              l.map(v => num(v).toInt).mkString(",")
            case Some(v) => num(v).toInt.toString
            case None => sys.error("GaussianBlur needs 'kernel_size'")
          }
          val sigma = tp.get("sigma").map {
            case l: List[_] if l.length == 2 => l.map(num).mkString(",")
            case v => num(v).toString // scalar sigma pins lo == hi
          }
          (80, Map("blur" -> ks) ++ sigma.map("blur_sigma" -> _))
        case "ToTensor" => only(); (90, Map("layout" -> "chw"))
        case "Normalize" =>
          only("mean", "std")
          (100, Map("normalize_mean" -> nums("mean"), "normalize_std" -> nums("std")))
        case other =>
          // escape hatch: a transform name registered via
          // ImageTransforms.registerConfigOp runs in-chain at its
          // registered rank; anything else still fails fast (parity
          // with instantiate's open world, sample_mappers.py:104-108,
          // bounded to explicit registrations instead of imports)
          graft.operators.ImageTransforms.configOpRank(other) match {
            case Some(rank) =>
              val encoded = tp.map { case (k, v) =>
                val sv = v match {
                  case l: List[_] => l.map(num).mkString(",")
                  case x => x.toString
                }
                require(!sv.contains("|") && !sv.contains("="),
                  s"user op $other param $k: '|' and '=' not allowed in values")
                s"$k=$sv"
              }.mkString("|")
              (rank, Map(s"user_op_${rank}_$other" -> encoded))
            case None => sys.error(s"unsupported torchvision transform: $other " +
              "(supported: RandomResizedCrop, Resize, Pad, RandomRotation, RandomAffine, " +
              "RandomCrop, CenterCrop, RandomHorizontalFlip, ColorJitter, GaussianBlur, " +
              "ToTensor, Normalize, or a name registered via ImageTransforms.registerConfigOp)")
          }
      }
    }
    val ranked = transforms.map(one)
    val ranks = ranked.map(_._1)
    // strictly increasing: every transform has a DISTINCT rank equal to
    // its position in the execution chain, so any config order the chain
    // can't honor — including the same transform twice — errors here
    // instead of silently executing in a different order.
    if (ranks.sliding(2).exists { case Seq(a, b) => a >= b; case _ => false }) sys.error(
      "torchvision transform order not supported: image_transforms applies " +
        "rrc → resize → pad → rotation → crop → flip → jitter → blur → ToTensor → " +
        "normalize, each at most once; reorder the config " +
        s"or compose multiple TorchVisionImageTransforms stages (got: $transforms)")
    ranked.map(_._2).foldLeft(Map("key" -> key))(_ ++ _)
  }

  private def snake(camel: String): String =
    camel.replaceAll("([a-z0-9])([A-Z])", "$1_$2").toLowerCase

  private def asMap(v: Any, what: String): Map[String, Any] = v match {
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
    case other => sys.error(s"expected a mapping for $what, got: $other")
  }

  private def int(v: Option[Any]): Option[Int] = v match {
    case Some(n: java.lang.Long) => Some(n.intValue())
    case Some(n: java.lang.Double) => Some(n.intValue())
    case Some(s: String) => s.toIntOption
    case _ => None
  }

  // byte budgets exceed Int range; parse as Long
  private def long(v: Option[Any]): Option[Long] = v match {
    case Some(n: java.lang.Long) => Some(n.longValue())
    case Some(n: java.lang.Double) => Some(n.longValue())
    case Some(s: String) => s.toLongOption
    case _ => None
  }

  private def num(v: Any): Double = v match {
    case n: java.lang.Long => n.doubleValue()
    case n: java.lang.Double => n.doubleValue()
    case s: String => s.toDouble
    case other => sys.error(s"expected a number, got $other")
  }
}
