package graft.tools

/** Dev tool: print the structural signature of a fuzz seed range.
  * Optional third arg = grammar revision (default [[Fuzz.LatestRev]]). */
object FuzzShapes {
  def main(args: Array[String]): Unit = {
    import graft.fuzz.Fuzz._
    val rev = if (args.length > 2) args(2).toInt else LatestRev
    (args(0).toLong to args(1).toLong).foreach { s =>
      def sig(pl: Plan): String = pl match {
        case Scan(t) => t
        case Filter(c, _) => s"F(${sig(c)})"
        case Project(c, _) => s"P(${sig(c)})"
        case Agg(c, k, a) => s"A${k.size}k${a.size}a(${sig(c)})"
        case Join(l, r, jt, _, _, res) =>
          s"J-$jt${if (res.isDefined) "+res" else ""}(${sig(l)},${sig(r)})"
        case Distinct(c) => s"D(${sig(c)})"
        case SortLimit(c, n, off, nl) =>
          s"L$n${if (off > 0) s"o$off" else ""}${if (nl) "nl" else ""}(${sig(c)})"
        case UnionAll(l, r) => s"U(${sig(l)},${sig(r)})"
        case SetOp(l, r, op) => s"S-$op(${sig(l)},${sig(r)})"
        case Rollup(c, k, a, _, cube) => s"${if (cube) "C" else "R"}${k.size}k${a.size}a(${sig(c)})"
        case ScalarFilter(c, col, op, sub, _) =>
          s"SQ-${col.name}$op(${sig(c)},${sig(sub)})"
        case InSub(c, key, sub, _, neg) =>
          s"IN${if (neg) "!" else ""}-${key.name}(${sig(c)},${sig(sub)})"
        case CorrScalar(c, key, sub, _, _, agg, _) =>
          s"CS-${agg.name}@${key.name}(${sig(c)},${sig(sub)})"
        case CorrScalarCmp(c, key, sub, _, _, agg, op, cmp, _) =>
          // CW = WHERE-position; the HAVING form shows as CW over A
          s"CW-${cmp.name}$op${agg.name}@${key.name}(${sig(c)},${sig(sub)})"
        case CorrInSub(c, key, sub, _, _, cmp, neg, _) =>
          s"CI${if (neg) "!" else ""}-${cmp.name}@${key.name}(${sig(c)},${sig(sub)})"
        case CorrQuantCmp(c, key, sub, _, _, op, all, cmp, _) =>
          s"CQ-${cmp.name}$op${if (all) "ALL" else "ANY"}@${key.name}(${sig(c)},${sig(sub)})"
        case JoinOnSub(l, r, jt, _, _, sub, _, _, ck, mode, op, cmp, _) =>
          s"JO-$jt-$mode-${cmp.name}$op@${ck.name}(${sig(l)},${sig(r)},${sig(sub)})"
        case LateralTopN(c, key, sub, _, _, n, desc, nl, outer, _) =>
          s"LT${if (outer) "left" else "cross"}$n${if (desc) "d" else "a"}" +
            s"${if (nl) "nl" else ""}@${key.name}(${sig(c)},${sig(sub)})"
        case RecCte(seed, sk, edges, src, dst, md, _) =>
          s"RC$md-${sk.name}>${src.name}->${dst.name}(${sig(seed)},${sig(edges)})"
        case RangeOffsetSum(c, pb, oc, sc, lo, hi, desc, _) =>
          s"RF${lo}p${hi.map(h => s"${h}f").getOrElse("c")}" +
            s"${if (desc) "d" else "a"}-${sc.name}@${oc.name}/${pb.name}(${sig(c)})"
        case WindowOp(c, pb, fn, _, nl) =>
          val f = fn match {
            case RowNum => "rownum"; case RankW => "rank"
            case DenseRankW => "dense"; case RunSumL(x) => s"runsum:${x.name}"
            case RunSumRangeL(x) => s"rangesum:${x.name}"
            case LagL(x) => s"lag:${x.name}"; case LeadL(x) => s"lead:${x.name}"
            case NtileW(n) => s"ntile$n"
            case FirstValL(x) => s"firstval:${x.name}"
            case LastValL(x) => s"lastval:${x.name}"
            case LastValRangeL(x) => s"lastvalrange:${x.name}"
          }
          s"W-$f${if (nl) "-nl" else ""}@${pb.name}(${sig(c)})"
      }
      println(f"$s%4d ${sig(genPlan(s, rev))}")
    }
  }
}
