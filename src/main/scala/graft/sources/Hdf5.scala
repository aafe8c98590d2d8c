package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal self-contained HDF5 codec for the NetCDF-4 ingestion path —
  * the reference reads NetCDF-4 transparently via xarray/h5netcdf
  * (formats/netcdf.py:33-366); this is the JVM-native equivalent,
  * written from the public HDF5 File Format Specification (v3) and the
  * public NetCDF-4 dimension-scale conventions. No external libraries.
  *
  * Reader coverage (what real netcdf-c output uses):
  *  - superblock versions 0/1 (symbol-table root) and 2/3 (direct root)
  *  - object headers v1 (unsigned prefix) and v2 ("OHDR"), with
  *    continuation blocks for both
  *  - groups via symbol tables (B-tree v1 + SNOD + local heap), via
  *    compact link messages, AND via dense storage (fractal heap +
  *    name-index B-tree v2) — the layout netcdf-c switches to above 8
  *    links, i.e. every wide NetCDF-4 file; direct-root heaps,
  *    indirect blocks NESTED to any depth (thousands-of-links files),
  *    and multi-level name-index B-trees covered; FILTERED heaps
  *    (direct blocks behind the heap's own deflate pipeline) decode;
  *    TINY heap IDs (object embedded in the ID) and HUGE heap IDs
  *    (direct address form, and the indirect form keyed into the
  *    heap's huge-object v2 B-tree) resolve; filtered huge objects
  *    fail loudly
  *  - dataspace v1/v2, datatype classes: fixed-point, IEEE float,
  *    string, reference, vlen; string DATASETS (fixed-length in both
  *    the netcdf-c NC_CHAR size-1 form and the h5py width-W form, and
  *    vlen strings resolved through the global heap) surface as
  *    NC_CHAR-style label variables
  *  - data layout v3: contiguous and chunked (B-tree v1 chunk index,
  *    any nesting level, partial edge chunks)
  *  - data layout v4 (HDF5 ≥1.10, h5py libver='latest'/netcdf-c with
  *    version bounds): all five chunk index types — single chunk,
  *    implicit, fixed array (paged + unpaged data blocks), extensible
  *    array (index-block elements, direct data blocks, super blocks
  *    with the H5EA geometric growth, and paged data blocks), and
  *    version-2 B-trees (record types 10/11, any depth via the shared
  *    BTHD walker)
  *  - filter pipeline v1/v2: deflate (id 1), byte-shuffle (id 2) and
  *    fletcher32 checksum (id 3, verified then stripped — corrupt
  *    chunks fail loudly instead of decoding wrong numbers)
  *  - attribute messages v1/v2/v3, including NetCDF-4's DIMENSION_LIST
  *    (vlen of object references resolved through the global heap) and
  *    CLASS/NAME dimension-scale tags, _FillValue
  *
  * The writer exists to fabricate honest fixtures: it emits the exact
  * layout netcdf-c produces by default — superblock v0, v1 object
  * headers, a symbol-table root group, contiguous coordinate variables,
  * chunked+deflated data variables, dimension-scale attributes and
  * DIMENSION_LIST references — so the reader's real-world paths are the
  * ones the round-trip test exercises.
  */
object Hdf5 {

  private val Undef = -1L // 0xFFFFFFFFFFFFFFFF: the undefined address

  /** `isChar`: a string dataset (fixed-length class 3 or vlen-string
    * class 9) surfaced as char codes, NC_CHAR-style — the trailing
    * shape entry is the string width. */
  /** `srcFile`: which physical file the dataset came from (resolver-
    * relative sibling name; "" = the root granule) — external links
    * merge datasets from several files into one listing, and object
    * ADDRESSES are only unique within their own file, so every
    * address-keyed lookup (DIMENSION_LIST) must carry the file too. */
  case class Dataset(name: String, addr: Long, shape: Seq[Int],
                     data: Array[Float], attrs: Map[String, Any],
                     isChar: Boolean = false, srcFile: String = "")
  case class File(datasets: Seq[Dataset])

  /** Sniff on the 4-byte `\x89HDF` prefix (matching the reference's sniff,
    * georiva formats/netcdf.py:38-47); full files carry the 8-byte signature
    * but callers may probe with as few as 4 bytes. */
  def canHandle(b: Array[Byte]): Boolean =
    b.length >= 4 && (b(0) & 0xff) == 0x89 && b(1) == 'H' && b(2) == 'D' && b(3) == 'F'

  // ================= reader =========================================

  /** Parsed datatype: cls ∈ {0 fixed, 1 float, 3 string, 7 reference,
    * 9 vlen}; consumed = encoded byte length (for walking attributes). */
  /** `precision`/`bitOffset`: a fixed-point type's significant-bit
    * field (datatype message properties) — full-width for ordinary
    * integers, narrower for n-bit-filtered datasets, where the value
    * is the field at [bitOffset, bitOffset+precision), sign-extended
    * from its own top bit when signed. */
  private case class Dt(cls: Int, size: Int, bigEndian: Boolean, signed: Boolean,
                        base: Option[Dt], consumed: Int,
                        precision: Int = 0, bitOffset: Int = 0,
                        members: Seq[(String, Int, Dt, Seq[Int])] = Nil) {
    def narrowed: Boolean = cls == 0 && precision > 0 && precision < 8 * size
  }

  /** Sibling-file resolver for cross-file virtual datasets: maps a VDS
    * mapping's source file name (as stored in the file — relative to
    * the virtual file's own directory) to an open [[ByteIn]], or None
    * when that file is absent (a DANGLING mapping: its region keeps
    * the fill value, matching HDF5's default VDS view semantics).
    * Path SAFETY is the resolver's job (refuse absolute paths and
    * `..` escapes — see `Formats.siblingsOf`); lifecycle is the
    * reader's: every resolved ByteIn is closed before `read` returns. */
  type Siblings = String => Option[ByteIn]

  /** Per-read state for cross-file VDS resolution: caches each sibling
    * file's (ByteIn, root address) so N mappings onto one member file
    * open and parse it once, and closes everything when the read ends.
    * `siblings = None` means the caller had no directory context
    * (bytes-only entry points) — cross-file mappings then fail loudly
    * instead of silently producing fill values. */
  private class ReadCtx(val siblings: Option[Siblings]) {
    private val opened =
      scala.collection.mutable.Map[String, Option[(ByteIn, Long)]]()
    def resolve(name: String): Option[(ByteIn, Long)] =
      opened.getOrElseUpdate(name,
        siblings.flatMap(f => f(name)).map { s =>
          // a corrupt/non-HDF5 member must stay LOUD, but its channel
          // must not leak: the failure happens before the entry lands
          // in `opened`, so closeAll would never see it (under
          // quarantining ingest that's a handle leak per bad granule)
          try (s, rootAddrOf(s))
          catch { case e: Throwable => s.close(); throw e }
        })
    def closeAll(): Unit =
      opened.valuesIterator.flatten.foreach(o => o._1.close())
  }

  /** Resolve `name` relative to the directory of the referring file
    * (both resolver-relative): a link or VDS mapping inside
    * "members/m1.h5" naming "m2.h5" probes "members/m2.h5" — the
    * referring-file-relative search libhdf5 performs. The resolver's
    * escape guard still applies to the combined name. */
  private def joinRel(from: String, name: String): String = {
    val slash = from.lastIndexOf('/')
    if (slash < 0) name else from.substring(0, slash + 1) + name
  }

  def read(bytes: Array[Byte]): File = read(ByteIn(bytes))

  def read(in: ByteIn): File = read(in, None)

  def read(in: ByteIn, siblings: Option[Siblings]): File = {
    val rootAddr = rootAddrOf(in)
    val out = scala.collection.mutable.Buffer[Dataset]()
    val ctx = new ReadCtx(siblings)
    try readGroup(in, rootAddr, "", out, rootAddr, ctx)
    finally ctx.closeAll()
    File(out.toSeq)
  }

  private def rootAddrOf(in: ByteIn): Long = {
    require(in.length > 8 && canHandle(in.slice(0, 8)), "not HDF5")
    val ver = in(8) & 0xff
    ver match {
      case 0 | 1 =>
        require((in(13) & 0xff) == 8 && (in(14) & 0xff) == 8,
          "only 8-byte offsets/lengths supported")
        val fixed = if (ver == 0) 24 else 28 // v1 adds indexed-storage-k + reserved
        // base/freespace/eof/driver addresses, then the root group's
        // symbol table entry: link-name-offset(8), object-header-addr(8)
        in.getLong(fixed + 32 + 8)
      case 2 | 3 =>
        require((in(9) & 0xff) == 8 && (in(10) & 0xff) == 8,
          "only 8-byte offsets/lengths supported")
        in.getLong(36)
      case v => throw new IllegalArgumentException(s"unsupported superblock v$v")
    }
  }

  /** All header messages of the object at `addr`, continuations resolved. */
  private def messages(in: ByteIn, addr: Long): Seq[(Int, Long)] = {
    // returns (message type, body offset); body length is implicit in the parse
    val msgs = scala.collection.mutable.Buffer[(Int, Long, Int)]() // type, off, size
    val a = addr
    if (in(a) == 1) { // v1 object header
      val nMsgs = in.getShort(a + 2) & 0xffff
      // blocks of raw messages: (start, end); first block after 16-byte prefix
      val hdrSize = in.getInt(a + 8)
      var blocks = List((a + 16, a + 16 + hdrSize))
      var read = 0
      while (blocks.nonEmpty && read < nMsgs) {
        val (start, end) = blocks.head
        blocks = blocks.tail
        var p = start
        while (p + 8 <= end && read < nMsgs) {
          val typ = in.getShort(p) & 0xffff
          val sz = in.getShort(p + 2) & 0xffff
          val body = p + 8
          if (typ == 0x10) // continuation: offset(8) + length(8)
            blocks = blocks :+ ((in.getLong(body),
              in.getLong(body) + in.getLong(body + 8)))
          else if (typ != 0) msgs += ((typ, body, sz))
          read += 1
          p = body + sz
        }
      }
    } else if (in(a) == 'O' && in(a + 1) == 'H' && in(a + 2) == 'D' && in(a + 3) == 'R') {
      val flags = in(a + 5) & 0xff
      var p = a + 6
      if ((flags & 0x20) != 0) p += 16 // access/mod/change/birth times
      if ((flags & 0x10) != 0) p += 4  // max compact / min dense
      val szBytes = 1 << (flags & 3)
      val chunk0 = szBytes match {
        case 1 => in(p) & 0xffL
        case 2 => in.getShort(p) & 0xffffL
        case 4 => in.getInt(p) & 0xffffffffL
        case _ => in.getLong(p)
      }
      p += szBytes
      var blocks = List((p, p + chunk0.toInt))
      while (blocks.nonEmpty) {
        val (start, end) = blocks.head
        blocks = blocks.tail
        var q = start
        while (q + 4 <= end) {
          val typ = in(q) & 0xff
          val sz = in.getShort(q + 1) & 0xffff
          var body = q + 4
          if ((flags & 0x04) != 0) body += 2 // creation-order field per message
          if (body + sz > end) q = end // trailing gap, not a real message
          else {
            if (typ == 0x10) {
              val o = in.getLong(body)
              val len = in.getLong(body + 8)
              blocks = blocks :+ ((o + 4, o + len - 4)) // skip OCHK sig + checksum
            } else if (typ != 0) msgs += ((typ, body, sz))
            q = body + sz
          }
        }
      }
    } else throw new IllegalArgumentException(s"unrecognized object header at $addr")
    msgs.toSeq.map { case (t, off, _) => (t, off) }
  }

  /** All links of the group object at `addr` (compact messages,
    * old-style symbol table, dense fractal heap). */
  private def linksOf(in: ByteIn, addr: Long): Seq[Link] =
    linksOf(in, messages(in, addr))

  /** Overload over already-parsed header messages — readGroup has them
    * in hand for the dataset check, so the header isn't parsed twice
    * per group. */
  private def linksOf(in: ByteIn,
                      msgs: Seq[(Int, Long)]): Seq[Link] = {
    val links = scala.collection.mutable.Buffer[Link]()
    msgs.foreach {
      case (0x11, off) => // symbol table: btree addr + local heap addr
        val btree = in.getLong(off); val heap = in.getLong(off + 8)
        val heapData = in.getLong(heap + 24)
        walkGroupBtree(in, btree, heapData, links)
      case (0x02, off) => // link info: dense groups route via fractal heap
        val base = off + 2 + (if ((in(off + 1) & 1) != 0) 8 else 0)
        val fh = in.getLong(base)
        if (fh != Undef) denseLinks(in, fh, in.getLong(base + 8), links)
      case (0x06, off) => links += parseLink(in, off)
      case _ =>
    }
    links.toSeq
  }

  /** Resolve a soft-link path to an object-header address: absolute
    * paths walk from the root, relative ones from the linking group;
    * soft links may chain (depth-guarded against cycles). Returns None
    * for a DANGLING path — a legitimate HDF5 state that iteration
    * skips (h5ls/h5py behavior), never an error. */
  private def resolvePath(in: ByteIn, rootAddr: Long,
                          fromAddr: Long, path: String, depth: Int): Option[Long] = {
    require(depth < 16, s"soft-link chain too deep at '$path' (cycle?)")
    var cur = if (path.startsWith("/")) rootAddr else fromAddr
    for (part <- path.split("/").iterator.filter(_.nonEmpty)) {
      linksOf(in, cur).find(_._1 == part) match {
        case Some((_, HardLink(a))) => cur = a
        case Some((_, SoftLink(p2))) =>
          resolvePath(in, rootAddr, cur, p2, depth + 1) match {
            case Some(a) => cur = a
            case None => return None
          }
        // a path cannot traverse into another FILE and still yield an
        // address in this one; treat as dangling (iteration skips)
        case Some((_, ExternalLink(_, _))) => return None
        case None => return None
      }
    }
    Some(cur)
  }

  /** `fileTag`: resolver-relative name of the file being walked ("" =
    * root granule); `rootPrefix`: the traversal prefix at which THIS
    * file's root was entered (datasets inside it surface under it). */
  private def readGroup(in: ByteIn, addr: Long,
                        prefix: String, out: scala.collection.mutable.Buffer[Dataset],
                        rootAddr: Long, ctx: ReadCtx,
                        seen: Set[Long] = Set.empty, extDepth: Int = 0,
                        fileTag: String = "", rootPrefix: String = ""): Unit = {
    // ancestor guard: a link (soft or hard) back to an enclosing group
    // would recurse forever; the same group under SIBLING names is
    // legitimate (an alias) and stays allowed
    if (seen.contains(addr)) return
    val msgs = messages(in, addr)
    if (msgs.map(_._1).contains(0x08)) { // data layout → dataset
      // OPAQUE (class 5) and REFERENCE (class 7) datasets are
      // metadata-adjacent (HDF-EOS runtime blobs, region-reference
      // tables) — they carry no raster values, so they SKIP with a
      // diagnostic instead of failing the granule. Every other
      // unsupported class still dead-letters loudly in readDataset:
      // those could be mis-decoded pixels; these cannot be pixels.
      val dtCls = msgs.find(_._1 == 0x03).map { case (_, off) => in(off) & 0x0f }
      if (dtCls.contains(5) || dtCls.contains(7)) {
        System.err.println(s"[hdf5] skipping " +
          (if (dtCls.contains(5)) "opaque" else "object-reference") +
          s"-typed dataset '${prefix.stripSuffix("/")}' (metadata-adjacent, " +
          "no raster values)")
        return
      }
      out ++= readDatasetAll(in, addr, prefix, msgs, rootAddr, 0, ctx,
        fileTag, rootPrefix)
      return
    }
    val seen2 = seen + addr
    linksOf(in, msgs).foreach {
      case (name, HardLink(child)) =>
        readGroup(in, child, prefix + name + "/", out, rootAddr, ctx, seen2,
          extDepth, fileTag, rootPrefix)
      case (name, SoftLink(path)) =>
        // soft link: resolve (dangling targets are skipped, like h5py
        // iteration); the linked object surfaces under the LINK's name
        resolvePath(in, rootAddr, addr, path, 0).foreach(child =>
          readGroup(in, child, prefix + name + "/", out, rootAddr, ctx, seen2,
            extDepth, fileTag, rootPrefix))
      case (name, ExternalLink(file, path)) =>
        // external link: the mount-like aggregation layout. The target
        // object (group OR dataset) surfaces under the LINK's name,
        // decoded from the sibling file; missing files / dangling
        // paths skip like soft links; chains across files are
        // depth-guarded (A↔B external cycles would recurse forever —
        // the per-file `seen` set can't catch them)
        if (ctx.siblings.nonEmpty && extDepth < 4) {
          // the target name resolves relative to the REFERRING file's
          // directory, like libhdf5's sibling search
          val tag = joinRel(fileTag, file)
          ctx.resolve(tag).foreach { case (sIn, sRoot) =>
            resolvePath(sIn, sRoot, sRoot, path, 0).foreach(child =>
              readGroup(sIn, child, prefix + name + "/", out, sRoot, ctx,
                Set.empty, extDepth + 1, tag, prefix + name + "/"))
          }
        }
        else if (ctx.siblings.isEmpty)
          throw new IllegalArgumentException(
            s"external link '$name' -> '$file':'$path' needs directory " +
              "context (bytes-only entry point; ingest through " +
              "Formats.ingestDir / ingestLargePaths, which supply it)")
        else throw new IllegalArgumentException(
          s"external-link chain deeper than 4 at '$prefix$name' (cycle?)")
    }
  }

  /** Links of a dense (fractal-heap-backed) group. netcdf-c moves a
    * group from compact to dense storage above 8 links, so every WIDE
    * NetCDF-4 file (more than a handful of variables) routes here —
    * the reference reads them via h5netcdf (formats/netcdf.py:33-366).
    *
    * Listing strategy: every record of the name-index B-tree v2 holds
    * a fractal-heap ID; each ID resolves through the heap's doubling
    * table to a link-message body parsed with the same [[parseLink]]
    * the compact path uses. The heap's logical address space includes
    * block headers, so an object at logical offset X inside a block
    * whose logical range starts at B sits X−B bytes into the block's
    * on-disk allocation. Covered: direct-root heaps, indirect blocks
    * nested to any depth (each child indirect block restarts the
    * doubling table over its own span, mirroring libhdf5's
    * relative-offset re-lookup) and name-index B-trees of any depth.
    * Non-managed IDs resolve too: TINY objects decode straight from
    * the ID bytes, HUGE objects through the direct (address in ID)
    * form or the huge-object v2 B-tree; only filtered huge objects
    * fail loudly. */
  private[sources] def denseLinks(in: ByteIn, fhAddr: Long, bt2Addr: Long,
                         links: scala.collection.mutable.Buffer[Link]): Unit = {
    val h = fhAddr
    require(in(h) == 'F' && in(h + 1) == 'R' && in(h + 2) == 'H' && in(h + 3) == 'P',
      s"expected FRHP at $fhAddr")
    val heapIdLen = in.getShort(h + 5) & 0xffff
    val ioFilterLen = in.getShort(h + 7) & 0xffff
    val tableWidth = in.getShort(h + 110) & 0xffff
    val startSize = in.getLong(h + 112)
    val maxDirect = in.getLong(h + 120)
    val maxHeapBits = in.getShort(h + 128) & 0xffff
    val rootAddr = in.getLong(h + 132)
    val curRows = in.getShort(h + 140) & 0xffff
    // FILTERED heap (ioFilterLen > 0): direct blocks are stored behind
    // the heap's own filter pipeline (whole block filtered); the FRHP
    // gains the filtered ROOT direct block's size + mask, and indirect-
    // block entries for direct children gain (size, mask) after the
    // address. Filters decode through the shared pipeline kernel.
    val filtered = ioFilterLen > 0
    val (rootFilteredSize, rootFilterMask, heapFilters) =
      if (!filtered) (0L, 0, Seq.empty[Filter])
      else (in.getLong(h + 142), in.getInt(h + 150),
        parseFilterPipeline(in, h + 154))
    val offSize = (maxHeapBits + 7) / 8
    require(heapIdLen > offSize, s"heap ID length $heapIdLen too small for $offSize-byte offsets")
    // doubling table: rows 0 and 1 hold start-size blocks, row r ≥ 2
    // holds start << (r−1); only rows of direct blocks are walkable
    def rowSize(r: Int): Long = if (r < 2) startSize else startSize << (r - 1)
    val maxDirectRows = (63 - java.lang.Long.numberOfLeadingZeros(maxDirect / startSize)) + 2
    def unsignedLE(at: Long, n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v |= (in(at + i) & 0xffL) << (8 * i); i += 1 }
      v
    }
    def expectSig(b: ByteIn, a: Long, sig: String): Unit =
      require((0 until 4).forall(i => b(a + i) == sig.charAt(i).toByte),
        s"expected $sig at offset $a")
    // one defiltered direct block per address (several links usually
    // share a block — decompress once); unfiltered blocks read in
    // place through the file source at their absolute offset
    val blockCache = new java.util.HashMap[Long, ByteIn]()
    def directBlock(addr: Long, filteredSize: Long, mask: Int): (ByteIn, Long) =
      if (!filtered) (in, addr)
      else {
        var buf = blockCache.get(addr)
        if (buf == null) {
          buf = ByteIn(defilter(in.slice(addr, filteredSize.toInt),
            heapFilters, mask, 1))
          blockCache.put(addr, buf)
        }
        (buf, 0L)
      }
    // physical (buffer, offset) of the object at logical heap offset
    // `ho`. Indirect blocks nest: rows below maxDirectRows point at
    // direct blocks; rows at/above it point at CHILD indirect blocks,
    // each spanning rowSize(r) bytes with its own doubling table that
    // restarts at startSize — so the walk recurses with the offset
    // made relative to the child's span (the layout netcdf-c reaches
    // past ~32 KiB of link messages under default heap parameters,
    // i.e. thousands-of-variables files).
    def resolveIn(ibAddr: Long, base: Long, ho: Long, depth: Int): (ByteIn, Long) = {
      require(depth < 16, s"implausible fractal-heap nesting at offset $ho (corrupt heap?)")
      val ib = ibAddr; expectSig(in, ib, "FHIB")
      val entries = ib + 13 + offSize // sig, version, heap-header addr, block offset
      val rel = ho - base
      var r = 0
      var rowStart = 0L
      while (rel >= rowStart + tableWidth * rowSize(r)) {
        rowStart += tableWidth * rowSize(r); r += 1
      }
      val c = ((rel - rowStart) / rowSize(r)).toInt
      val childBase = base + rowStart + c.toLong * rowSize(r)
      // entry widths: direct-child rows carry addr(8) [+ size(8) +
      // mask(4) when filtered]; indirect-child rows carry addr(8) only
      val dirW = if (filtered) 20 else 8
      if (r < maxDirectRows) {
        val at = entries + (r * tableWidth + c) * dirW
        val child = in.getLong(at)
        val (fSz, fMask) =
          if (filtered) (in.getLong(at + 8), in.getInt(at + 16)) else (0L, 0)
        val (buf, cb) = directBlock(child, fSz, fMask)
        expectSig(buf, cb, "FHDB")
        (buf, cb + (ho - childBase))
      } else {
        val directCells = maxDirectRows.toInt * tableWidth
        val at = entries + directCells * dirW +
          ((r - maxDirectRows.toInt) * tableWidth + c) * 8
        resolveIn(in.getLong(at), childBase, ho, depth + 1)
      }
    }
    def resolve(ho: Long): (ByteIn, Long) =
      if (curRows == 0) { // root IS a direct block at logical offset 0
        val (buf, a) = directBlock(rootAddr, rootFilteredSize, rootFilterMask)
        expectSig(buf, a, "FHDB")
        (buf, a + ho)
      } else resolveIn(rootAddr, 0L, ho, 0)
    // B-tree v2 name index: walk the records at every level; hashes
    // are not consulted (listing is order-independent), only the
    // embedded heap IDs (each record = 4-byte name hash + heap ID).
    var hugeMap: java.util.HashMap[Long, Long] = null
    walkBtreeV2(in, bt2Addr) { (idAt0, _) =>
      val idAt = idAt0 + 4 // skip the name hash
      val idFlags = in(idAt) & 0xff
      ((idFlags >> 4) & 3) match {
        case 0 => // managed: resolve through the doubling table
          val (buf, o) = resolve(unsignedLE(idAt + 1, offSize))
          links += parseLink(buf, o)
        case 2 => // tiny: the link message IS the ID. Normal form keeps
          // length−1 in the low 4 flag bits; IDs longer than 18 bytes
          // use the extended form's extra low-byte (12-bit lengths).
          val (len, at) =
            if (heapIdLen <= 18) ((idFlags & 0x0f) + 1, idAt + 1)
            else ((((idFlags & 0x0f) << 8) | (in(idAt + 1) & 0xff)) + 1, idAt + 2)
          require(at - idAt + len <= heapIdLen,
            s"tiny heap object of $len bytes overruns its $heapIdLen-byte ID")
          links += parseLink(in, at)
        case 1 => // huge: past the max managed size. Direct IDs (ID wide
          // enough for address+length, libhdf5's rule) point straight at
          // the object; otherwise the ID is a key into the heap's huge-
          // object v2 B-tree — record type 1 (address, length, ID) for
          // plain heaps, type 3 on FILTERED heaps (address, stored
          // length, filter mask, de-filtered size, ID; the object's
          // bytes ran through the heap's own pipeline). Either tree is
          // walked ONCE into an id→record map shared by every huge
          // link — a per-link walk would be quadratic in huge links.
          def defilteredHuge(addr: Long, len: Long, mask: Int, mem: Long): ByteIn = {
            require(len > 0 && len <= Int.MaxValue && mem > 0 && mem <= Int.MaxValue,
              s"implausible filtered huge object ($len stored, $mem raw)")
            val buf = defilter(in.slice(addr, len.toInt), heapFilters, mask, 1,
              mem.toInt)
            require(buf.length == mem,
              s"filtered huge object decoded ${buf.length} bytes, expected $mem")
            ByteIn(buf)
          }
          if (!filtered && heapIdLen >= 17) {
            links += parseLink(in, unsignedLE(idAt + 1, 8))
          } else if (filtered && heapIdLen >= 29) {
            // direct filtered ID: addr(8), stored len(8), mask(4), raw size(8)
            links += parseLink(defilteredHuge(unsignedLE(idAt + 1, 8),
              unsignedLE(idAt + 9, 8), unsignedLE(idAt + 17, 4).toInt,
              unsignedLE(idAt + 21, 8)), 0L)
          } else {
            if (hugeMap == null) {
              val hugeBt2 = in.getLong(h + 22)
              require(hugeBt2 != -1L, "huge heap ID but no huge-object B-tree")
              hugeMap = new java.util.HashMap[Long, Long]()
              walkBtreeV2(in, hugeBt2) { (rAt, _) =>
                hugeMap.put(unsignedLE(rAt + (if (filtered) 28 else 16), 8), rAt)
              }
            }
            val wantId = unsignedLE(idAt + 1, math.min(8, heapIdLen - 1))
            require(hugeMap.containsKey(wantId),
              s"huge object $wantId not in the huge-object B-tree")
            val rAt = hugeMap.get(wantId)
            if (!filtered) links += parseLink(in, in.getLong(rAt))
            else links += parseLink(defilteredHuge(in.getLong(rAt),
              in.getLong(rAt + 8), in.getInt(rAt + 16),
              in.getLong(rAt + 20)), 0L)
          }
        case t =>
          throw new IllegalArgumentException(s"unknown fractal-heap ID type $t")
      }
    }
  }

  /** Walk every record of a version-2 B-tree, calling `onRecord` with
    * (record offset, record size). Multi-level trees descend through
    * BTIN internal nodes whose child pointers carry variable-width
    * record counts: the widths follow libhdf5's H5B2 sizing (bytes to
    * encode the max records a child node/subtree can hold, derived
    * from node size and record size). Shared by the dense-group name
    * index (record types 5/6) and the layout-v4 chunk indexes
    * (record types 10/11). */
  private def walkBtreeV2(in: ByteIn, bt2Addr: Long)(
      onRecord: (Long, Int) => Unit): Unit = {
    def uLE(at: Long, n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v |= (in(at + i) & 0xffL) << (8 * i); i += 1 }
      v
    }
    def sig4(a: Long, sig: String): Unit =
      require((0 until 4).forall(i => in(a + i) == sig.charAt(i).toByte),
        s"expected $sig at file offset $a")
    val b = bt2Addr; sig4(b, "BTHD")
    val nodeSize = in.getInt(b + 6)
    val recordSize = in.getShort(b + 10) & 0xffff
    val depth = in.getShort(b + 12) & 0xffff
    require(depth <= 8, s"implausible B-tree v2 depth $depth (corrupt header?)")
    val rootAddr2 = in.getLong(b + 16)
    val rootNRec = in.getShort(b + 24) & 0xffff
    require(nodeSize > 10 + recordSize && recordSize > 4,
      s"implausible B-tree v2 geometry (node $nodeSize, record $recordSize)")
    def encSize(v: Long): Int = (63 - java.lang.Long.numberOfLeadingZeros(v)) / 8 + 1
    // per-level maxima (H5B2): leaf capacity, then each internal level's
    // record capacity given its child-pointer overhead, and the
    // cumulative subtree capacity that sizes the depth≥2 "total" field
    val maxNrec = new Array[Long](depth + 1)
    val cumMaxNrec = new Array[Long](depth + 1)
    maxNrec(0) = (nodeSize - 10) / recordSize
    cumMaxNrec(0) = maxNrec(0)
    for (d <- 1 to depth) {
      val ptr = 8 + encSize(maxNrec(d - 1)) +
        (if (d >= 2) encSize(cumMaxNrec(d - 1)) else 0)
      maxNrec(d) = (nodeSize - 10 - ptr) / (recordSize + ptr)
      require(maxNrec(d) > 0, s"B-tree v2 node too small for depth-$d pointers")
      cumMaxNrec(d) = (maxNrec(d) + 1) * cumMaxNrec(d - 1) + maxNrec(d)
    }
    def descend(addr: Long, nRec: Int, d: Int): Unit =
      if (d == 0) {
        val l = addr; sig4(l, "BTLF")
        for (i <- 0 until nRec) onRecord(l + 6 + i * recordSize, recordSize)
      } else {
        val a = addr; sig4(a, "BTIN")
        for (i <- 0 until nRec) onRecord(a + 6 + i * recordSize, recordSize)
        val n1 = encSize(maxNrec(d - 1))
        val n2 = if (d >= 2) encSize(cumMaxNrec(d - 1)) else 0
        val ptrBase = a + 6 + nRec * recordSize
        val ptrSz = 8 + n1 + n2
        for (i <- 0 to nRec) {
          val at = ptrBase + i * ptrSz
          descend(in.getLong(at), uLE(at + 8, n1).toInt, d - 1)
        }
      }
    descend(rootAddr2, rootNRec, depth)
  }

  private def walkGroupBtree(in: ByteIn, addr: Long, heapData: Long,
                             links: scala.collection.mutable.Buffer[Link]): Unit = {
    val a = addr
    require(in(a) == 'T' && in(a + 1) == 'R', s"expected TREE at $addr")
    val level = in(a + 5) & 0xff
    val n = in.getShort(a + 6) & 0xffff
    var p = a + 24 // past sig, type, level, entries, 2 sibling addrs
    p += 8 // key 0
    for (_ <- 0 until n) {
      val child = in.getLong(p); p += 16 // child + following key
      if (level > 0) walkGroupBtree(in, child, heapData, links)
      else { // SNOD symbol-table node
        val c = child
        require(in(c) == 'S' && in(c + 1) == 'N', s"expected SNOD at $child")
        val nSym = in.getShort(c + 6) & 0xffff
        for (i <- 0 until nSym) {
          val e = c + 8 + i * 40
          val nameOff = in.getLong(e)
          val ohAddr = in.getLong(e + 8)
          val cacheType = in.getInt(e + 16)
          val name = cString(in, heapData + nameOff)
          // cache type 2 = symbolic (soft) link: the header address is
          // undefined and the scratch area's first word is the local-
          // heap offset of the path string — the DEFAULT h5py/libhdf5
          // soft-link layout for old-style groups
          if (cacheType == 2) {
            val pathOff = in.getInt(e + 24) & 0xffffffffL
            links += ((name, SoftLink(cString(in, heapData + pathOff))))
          } else links += ((name, HardLink(ohAddr)))
        }
      }
    }
  }

  /** One parsed link: hard (object-header address) or soft (path,
    * resolved during traversal). */
  private[sources] sealed trait LinkTarget
  private[sources] case class HardLink(addr: Long) extends LinkTarget
  private[sources] case class SoftLink(path: String) extends LinkTarget
  /** External link (H5L class 64): the target lives in ANOTHER file —
    * resolved through the read's sibling resolver like cross-file VDS
    * sources (same directory-rooted, path-escape-guarded contract). */
  private[sources] case class ExternalLink(file: String, path: String) extends LinkTarget
  private[sources] type Link = (String, LinkTarget)

  private def parseLink(in: ByteIn, off: Long): Link = {
    val flags = in(off + 1) & 0xff
    var p = off + 2
    var linkType = 0
    if ((flags & 0x08) != 0) {
      linkType = in(p) & 0xff
      require(linkType <= 1 || linkType == 64,
        s"link type $linkType not supported (0 hard, 1 soft, 64 external; " +
          "user-defined fail loudly)")
      p += 1
    }
    if ((flags & 0x04) != 0) p += 8 // creation order
    if ((flags & 0x10) != 0) p += 1 // charset
    val lenBytes = 1 << (flags & 3)
    val nameLen = lenBytes match {
      case 1 => in(p) & 0xff
      case 2 => in.getShort(p) & 0xffff
      case _ => in.getInt(p)
    }
    p += lenBytes
    val name = in.string(p, nameLen)
    p += nameLen
    if (linkType == 0) (name, HardLink(in.getLong(p)))
    else if (linkType == 1) { // soft: 2-byte length + path bytes
      val plen = in.getShort(p) & 0xffff
      (name, SoftLink(in.string(p + 2, plen)))
    } else { // external (64): 2-byte length, then version|flags byte,
      // file name NUL-terminated, object path NUL-terminated
      val plen = in.getShort(p) & 0xffff
      val body = p + 2
      require((in(body) & 0xff) == 0,
        s"external link version/flags ${in(body) & 0xff} not supported")
      val file = cString(in, body + 1)
      val path = cString(in, body + 1 + file.getBytes("UTF-8").length + 1)
      // BYTE lengths, not char counts — a multibyte name must not
      // defeat the bound and let cString read past the declared value
      val consumed = 1 + file.getBytes("UTF-8").length + 1 +
        path.getBytes("UTF-8").length + 1
      require(consumed <= plen,
        s"external link value overruns its declared length ($consumed > $plen)")
      (name, ExternalLink(file, path))
    }
  }

  private def cString(in: ByteIn, off: Long): String = {
    var e = off
    while (in(e) != 0) e += 1
    in.string(off, (e - off).toInt)
  }

  private def parseDt(in: ByteIn, off: Long): Dt = {
    val cls = in(off) & 0x0f
    val b0 = in(off + 1) & 0xff
    val size = in.getInt(off + 4)
    cls match {
      case 0 => Dt(0, size, (b0 & 1) != 0, (b0 & 8) != 0, None, 8 + 4,
        precision = in.getShort(off + 10) & 0xffff,
        bitOffset = in.getShort(off + 8) & 0xffff)
      case 1 => Dt(1, size, (b0 & 1) != 0, signed = true, None, 8 + 12)
      case 2 => // time (class 2 — the H5T_UNIX_D32/64 family): bit 0
        // byte order, one 2-byte bit-precision property. Decoded as a
        // SIGNED full-width integer: the public spec carries no sign
        // flag and producers store time_t (signed) epoch seconds.
        val tPrec = in.getShort(off + 8) & 0xffff
        require(tPrec >= 1 && tPrec <= 8 * size,
          s"time precision $tPrec over a $size-byte element")
        Dt(2, size, (b0 & 1) != 0, signed = true, None, 8 + 2)
      case 4 => // bitfield (class 4): the fixed-point layout minus the
        // sign flag — 2-byte bit offset + 2-byte precision; padding
        // bits are undefined, values are UNSIGNED fields
        val bOff = in.getShort(off + 8) & 0xffff
        val bPrec = in.getShort(off + 10) & 0xffff
        require(bPrec >= 1 && bOff + bPrec <= 8 * size,
          s"bitfield [$bOff, +$bPrec) exceeds the $size-byte element")
        Dt(4, size, (b0 & 1) != 0, signed = false, None, 8 + 4,
          precision = bPrec, bitOffset = bOff)
      case 3 => Dt(3, size, bigEndian = false, signed = false, None, 8)
      case 7 => Dt(7, size, bigEndian = false, signed = false, None, 8)
      case 8 => // enumeration (NC_ENUM — classification rasters like
        // cloud masks): an integer base type plus named member values;
        // data decodes as the base type, labels surface as an attr
        val (base, names, namesEnd) = enumTable(in, off)
        require(base.cls == 0, s"enum base class ${base.cls} not supported (integer only)")
        val end = namesEnd + names.size.toLong * base.size // + member values
        Dt(8, size, base.bigEndian, base.signed, Some(base), (end - off).toInt)
      case 6 => // compound (HDF-EOS/NASA tables, netcdf-4 NC_COMPOUND):
        // members flatten to one variable each at the read surface
        val ver = (in(off) & 0xff) >> 4
        require(ver >= 1 && ver <= 3, s"compound datatype message v$ver")
        val nMembers = (in(off + 1) & 0xff) | ((in(off + 2) & 0xff) << 8)
        require(nMembers >= 1 && nMembers <= 1024,
          s"implausible compound member count $nMembers")
        var p = off + 8
        val members = (0 until nMembers).map { _ =>
          val nameStart = p
          var q = p
          while (in(q) != 0) q += 1
          val name = new String(in.slice(nameStart, (q - nameStart).toInt),
            java.nio.charset.StandardCharsets.UTF_8)
          // v1/v2 names pad to 8; v3 names are bare NUL-terminated
          p = if (ver <= 2) nameStart + ((q - nameStart + 1 + 7) / 8) * 8 else q + 1
          var mdims: Seq[Int] = Nil
          val moff = ver match {
            case 3 =>
              // minimal bytes that hold the compound's total size
              var nb = 1
              while ((1L << (8 * nb)) <= size) nb += 1
              var v = 0L
              var i = 0
              while (i < nb) { v |= (in(p + i) & 0xffL) << (8 * i); i += 1 }
              p += nb
              v.toInt
            case _ =>
              val v = in.getInt(p)
              p += 4
              if (ver == 1) {
                // v1 members carry their own dimensionality (the
                // HDF-EOS table layout: a member can be a small fixed
                // array, e.g. a per-row coordinate triple) —
                // dimensionality(1), reserved(3), permutation(4),
                // reserved(4), then 4 dim sizes; the member surfaces
                // with its dims appended to the dataset's shape
                val rank = in(p) & 0xff
                require(rank <= 4, s"implausible compound member rank $rank")
                mdims = (0 until rank).map { d0 =>
                  val sz = in.getInt(p + 12 + 4 * d0)
                  require(sz >= 1 && sz <= (1 << 20),
                    s"implausible compound member dim size $sz")
                  sz
                }
                p += 28 // dimensionality, reserved, permutation, 4 dim sizes
              }
              v
          }
          val mdt = parseDt(in, p)
          p += mdt.consumed
          require(moff >= 0 &&
              moff + mdt.size.toLong * mdims.product.max(1) <= size,
            s"compound member '$name' at $moff overruns the $size-byte element")
          (name, moff, mdt, mdims)
        }
        Dt(6, size, bigEndian = false, signed = false, None, (p - off).toInt,
          members = members)
      case 9 =>
        val base = parseDt(in, off + 8)
        Dt(9, size, bigEndian = false, signed = false, Some(base), 8 + base.consumed)
      case c => throw new IllegalArgumentException(s"unsupported datatype class $c")
    }
  }

  /** The ONE walk over an enum datatype message's member names
    * (NUL-terminated, 8-padded in v1/v2): (base type, names, offset
    * past the names). parseDt derives `consumed` from it and
    * enumMembers reads the values after it, so the padding rule can
    * never diverge between the two. */
  private def enumTable(in: ByteIn, off: Long): (Dt, Seq[String], Long) = {
    val base = parseDt(in, off + 8)
    val n = (in(off + 1) & 0xff) | ((in(off + 2) & 0xff) << 8)
    val ver = (in(off) & 0xff) >> 4
    var p = off + 8 + base.consumed
    val names = (0 until n).map { _ =>
      val s = p
      while (in(p) != 0) p += 1
      val name = new String(in.slice(s, (p - s).toInt),
        java.nio.charset.StandardCharsets.UTF_8)
      p += 1
      if (ver < 3) p = s + ((p - s + 7) / 8) * 8
      name
    }
    (base, names, p)
  }

  /** Member (name, value) pairs of an enum datatype message. */
  private def enumMembers(in: ByteIn, off: Long): Seq[(String, Long)] = {
    val (base, names, valuesAt) = enumTable(in, off)
    names.zipWithIndex.map { case (name, i) =>
      name -> element(in, valuesAt + i.toLong * base.size, base).toLong
    }
  }

  /** (rank, dims, consumed bytes) from a dataspace message. */
  private def parseDs(in: ByteIn, off: Long): (Int, Seq[Long], Int) = {
    val ver = in(off) & 0xff
    val rank = in(off + 1) & 0xff
    val flags = in(off + 2) & 0xff
    val hdr = if (ver == 1) 8 else 4
    val dims = (0 until rank).map(i => in.getLong(off + hdr + i * 8))
    val maxLen = if ((flags & 1) != 0) rank * 8 else 0
    (rank, dims, hdr + rank * 8 + maxLen)
  }

  private def element(in: ByteIn, off: Long, dt: Dt): Double = {
    def beShort = ((in(off) & 0xff) << 8 | (in(off + 1) & 0xff)).toShort
    def beInt = in.getIntBE(off)
    def beLong = in.getLongBE(off)
    dt.cls match {
      case 1 if dt.size == 4 =>
        java.lang.Float.intBitsToFloat(if (dt.bigEndian) beInt else in.getInt(off)).toDouble
      case 1 if dt.size == 8 =>
        java.lang.Double.longBitsToDouble(if (dt.bigEndian) beLong else in.getLong(off))
      case 0 if dt.narrowed =>
        // n-bit field: the stored bytes carry the value at
        // [bitOffset, bitOffset+precision); padding bits are undefined
        // (the n-bit filter zeroes them), so mask then sign-extend
        // from the field's OWN top bit — reading the full width would
        // misinterpret every negative value as large-positive
        var raw = 0L
        var i = 0
        while (i < dt.size) {
          val shift = if (dt.bigEndian) 8 * (dt.size - 1 - i) else 8 * i
          raw |= (in(off + i) & 0xffL) << shift
          i += 1
        }
        val field = (raw >>> dt.bitOffset) & ((1L << dt.precision) - 1)
        (if (dt.signed)
          (field << (64 - dt.precision)) >> (64 - dt.precision)
         else field).toDouble
      case 0 => dt.size match {
        case 1 => val v = in(off).toLong; (if (dt.signed) v else v & 0xff).toDouble
        case 2 => val v = if (dt.bigEndian) beShort else in.getShort(off)
          (if (dt.signed) v.toLong else v & 0xffff).toDouble
        case 4 => val v = if (dt.bigEndian) beInt else in.getInt(off)
          (if (dt.signed) v.toLong else v & 0xffffffffL).toDouble
        case _ => (if (dt.bigEndian) beLong else in.getLong(off)).toDouble
      }
      // time: full-width signed integer; bitfield: masked unsigned
      // field — both are the fixed-point decode with their parsed
      // sign/offset/precision, so delegate through a cls-0 view
      case 2 | 4 => element(in, off, dt.copy(cls = 0))
      case 8 => element(in, off, dt.base.get) // enum: decode as its base
      case c => throw new IllegalArgumentException(s"non-numeric element class $c")
    }
  }

  /** One global-heap object's payload. */
  private def gheapObject(in: ByteIn, addr: Long, idx: Int): Array[Byte] = {
    val a = addr
    require(in(a) == 'G' && in(a + 1) == 'C', s"expected GCOL at $addr")
    val end = a + in.getLong(a + 8).toInt
    var p = a + 16
    while (p + 16 <= end) {
      val oidx = in.getShort(p) & 0xffff
      val osize = in.getLong(p + 8).toInt
      if (oidx == idx) return in.slice(p + 16, osize)
      if (oidx == 0) throw new IllegalArgumentException(s"global heap object $idx not found")
      p += 16 + ((osize + 7) / 8) * 8
    }
    throw new IllegalArgumentException(s"global heap object $idx not found")
  }

  private def readAttr(in: ByteIn, off: Long): Option[(String, Any)] = {
    val ver = in(off) & 0xff
    require(ver >= 1 && ver <= 3, s"unsupported attribute message v$ver")
    val nameSize = in.getShort(off + 2) & 0xffff
    val dtSize = in.getShort(off + 4) & 0xffff
    val dsSize = in.getShort(off + 6) & 0xffff
    if (ver >= 2 && (in(off + 1) & 3) != 0) return None // shared dt/ds: skip
    var p = off + 8 + (if (ver == 3) 1 else 0)
    def pad8(n: Int) = ((n + 7) / 8) * 8
    val name = cString(in, p)
    p += (if (ver == 1) pad8(nameSize) else nameSize)
    val dt = parseDt(in, p)
    val dtOff = p
    p += (if (ver == 1) pad8(dtSize) else dtSize)
    val (_, dims, _) = parseDs(in, p)
    p += (if (ver == 1) pad8(dsSize) else dsSize)
    val n = dims.product.max(1).toInt
    val value: Any = dt.cls match {
      case 3 => cString(in, p)
      case 0 | 1 =>
        if (n == 1) element(in, p, dt)
        else (0 until n).map(i => element(in, p + i * dt.size, dt))
      case 9 if dt.base.exists(_.cls == 7) =>
        // vlen of object references (DIMENSION_LIST): per element a
        // (length, gheap addr, index) triple; resolve the first ref
        (0 until n).map { i =>
          val e = p + i * 16
          val len = in.getInt(e)
          if (len == 0) Undef
          else {
            val payload = gheapObject(in, in.getLong(e + 4), in.getInt(e + 12))
            ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN).getLong(0)
          }
        }
      case _ => return Some(name -> (())) // present but undecoded
    }
    val _ = dtOff
    Some(name -> value)
  }

  /** Parse a serialized dataspace selection (File Format Spec III.C,
    * the form VDS mappings embed). Returns (blocks, nextOffset):
    * None = H5S_SEL_ALL (every element); Some(list of (start, count)
    * per dimension) for NONE (empty list) and hyperslabs — v1 explicit
    * blocks (u32 start/end pairs) and v2 regular patterns
    * (start/stride/count/block u64 per dim, expanded to blocks). */
  /** A serialized virtual-mapping dataspace selection. `VSelUnlim` is
    * the regular hyperslab with H5S_UNLIMITED count on one dimension —
    * the printf-pattern ('%b') unlimited-dimension VDS form, legal
    * only where directory context bounds the extent. */
  private sealed trait VSel
  private case object VSelAll extends VSel
  private case class VSelBlocks(blocks: Seq[(Array[Long], Array[Long])]) extends VSel
  private case class VSelUnlim(st: Array[Long], sd: Array[Long],
                               cn: Array[Long], bl: Array[Long], udim: Int) extends VSel

  private def boundedSel(sel: VSel, what: String): Option[Seq[(Array[Long], Array[Long])]] =
    sel match {
      case VSelAll => None
      case VSelBlocks(blocks) => Some(blocks)
      case _: VSelUnlim => throw new IllegalArgumentException(
        s"unlimited (H5S_UNLIMITED) $what selection outside a " +
          "printf-pattern virtual mapping")
    }

  private def parseSelection(blob: Array[Byte], off0: Int): (VSel, Int) = {
    val bb = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN)
    val typ = bb.getInt(off0); val ver = bb.getInt(off0 + 4)
    typ match {
      case 3 => // H5S_SEL_ALL: version + 8 reserved bytes
        require(ver == 1, s"unsupported ALL-selection version $ver")
        (VSelAll, off0 + 16)
      case 0 => // H5S_SEL_NONE
        require(ver == 1, s"unsupported NONE-selection version $ver")
        (VSelBlocks(Nil), off0 + 16)
      case 2 if ver == 1 => // hyperslab: explicit block list
        var p = off0 + 8
        p += 4 // reserved
        p += 4 // encoded length (implicit in the parse)
        val rank = bb.getInt(p); p += 4
        val nb = bb.getInt(p); p += 4
        require(rank > 0 && rank <= 32, s"implausible selection rank $rank")
        require(nb >= 0 && nb <= (1 << 20), s"implausible block count $nb")
        val blocks = (0 until nb).map { _ =>
          val st = new Array[Long](rank); val ct = new Array[Long](rank)
          var d = 0
          while (d < rank) { st(d) = bb.getInt(p) & 0xffffffffL; p += 4; d += 1 }
          d = 0
          while (d < rank) { // opposite corner, INCLUSIVE
            ct(d) = (bb.getInt(p) & 0xffffffffL) - st(d) + 1; p += 4; d += 1
          }
          (st, ct)
        }
        (VSelBlocks(blocks), p)
      case 2 if ver == 2 => // regular hyperslab: start/stride/count/block
        var p = off0 + 8
        p += 1 // flags
        p += 4 // encoded length
        val rank = bb.getInt(p); p += 4
        require(rank > 0 && rank <= 32, s"implausible selection rank $rank")
        val st = new Array[Long](rank); val sd = new Array[Long](rank)
        val cn = new Array[Long](rank); val bl = new Array[Long](rank)
        var udim = -1
        var d = 0
        while (d < rank) {
          st(d) = bb.getLong(p); sd(d) = bb.getLong(p + 8)
          cn(d) = bb.getLong(p + 16); bl(d) = bb.getLong(p + 24)
          if (cn(d) == -1L) { // H5S_UNLIMITED (0xFFFFFFFFFFFFFFFF)
            require(udim < 0,
              "regular hyperslab with more than one H5S_UNLIMITED dimension")
            udim = d
            require(bl(d) >= 1 && sd(d) >= 1 && st(d) >= 0,
              s"implausible unlimited-hyperslab dim $d: start=${st(d)} " +
                s"stride=${sd(d)} block=${bl(d)}")
          } else
          // per-dim bounds BEFORE any product: raw 8-byte counts from a
          // corrupt file can make cn.product wrap Long and pass a
          // product-only check while the expansion loop runs ~2^64
          // iterations (hang/OOM — the fuzz contract forbids both)
          require(cn(d) >= 1 && cn(d) <= (1 << 20) &&
            bl(d) >= 1 && sd(d) >= 1 && st(d) >= 0,
            s"implausible regular-hyperslab dim $d: start=${st(d)} " +
              s"stride=${sd(d)} count=${cn(d)} block=${bl(d)}")
          p += 32; d += 1
        }
        if (udim >= 0) return (VSelUnlim(st, sd, cn, bl, udim), p)
        // overflow-safe total-block bound (per-dim caps alone still let
        // the product wrap at rank 32)
        val totalBlocks = cn.foldLeft(1L)((a, c) =>
          if (a > (1 << 20)) a else a * c)
        require(totalBlocks <= (1 << 20), s"implausible regular pattern ${cn.toSeq}")
        // expand count repetitions along every dim into explicit blocks
        val blocks = Seq.newBuilder[(Array[Long], Array[Long])]
        def rec(dim: Int, start: Array[Long]): Unit =
          if (dim == rank) blocks += ((start.clone(), bl.clone()))
          else {
            var i = 0L
            while (i < cn(dim)) {
              start(dim) = st(dim) + i * sd(dim)
              rec(dim + 1, start); i += 1
            }
          }
        rec(0, new Array[Long](rank))
        (VSelBlocks(blocks.result()), p)
      case 2 => throw new IllegalArgumentException(
        s"unsupported hyperslab selection version $ver (v1/v2 only)")
      case 1 => throw new IllegalArgumentException(
        "point-list virtual selections not supported")
      case t => throw new IllegalArgumentException(s"unknown selection type $t")
    }
  }

  /** Row-major element indices of a selection over `dims` (None = all). */
  private def selIndices(sel: Option[Seq[(Array[Long], Array[Long])]],
                         dims: Array[Int]): Array[Int] = {
    val rank = dims.length
    val strides = new Array[Long](rank)
    var s = 1L
    var d = rank - 1
    while (d >= 0) { strides(d) = s; s *= dims(d); d -= 1 }
    sel match {
      case None => Array.range(0, dims.product)
      case Some(blocks) =>
        val out = Array.newBuilder[Int]
        for ((st, ct) <- blocks) {
          require(st.length == rank,
            s"selection rank ${st.length} does not match dataset rank $rank")
          def rec(dm: Int, base: Long): Unit =
            if (dm == rank) out += base.toInt
            else {
              var i = 0L
              while (i < ct(dm)) {
                val c = st(dm) + i
                require(c >= 0 && c < dims(dm),
                  s"selection coordinate $c exceeds extent ${dims(dm)} in dim $dm")
                rec(dm + 1, base + c * strides(dm)); i += 1
              }
            }
          rec(0, 0L)
        }
        out.result()
    }
  }

  /** Single-dataset form for consumers that cannot take a compound's
    * member fan-out (VDS mapping sources). */
  private def readDataset(in: ByteIn, addr: Long,
                          prefix: String, msgs: Seq[(Int, Long)],
                          rootAddr: Long, vdsDepth: Int,
                          ctx: ReadCtx, fileTag: String = "",
                          rootPrefix: String = ""): Dataset =
    readDatasetAll(in, addr, prefix, msgs, rootAddr, vdsDepth, ctx,
      fileTag, rootPrefix) match {
      case Seq(d) => d
      case _ => throw new IllegalArgumentException(
        s"compound dataset at '$prefix' cannot serve as a virtual mapping source")
    }

  private def readDatasetAll(in: ByteIn, addr: Long,
                             prefix: String, msgs: Seq[(Int, Long)],
                             rootAddr: Long, vdsDepth: Int,
                             ctx: ReadCtx, fileTag: String = "",
                             rootPrefix: String = ""): Seq[Dataset] = {
    var dims: Seq[Long] = Nil
    var dt: Dt = null
    var fillRaw: Option[Array[Byte]] = None
    var layoutClass = -1
    var layoutVer = 3
    var dataAddr = Undef
    var dataSize = 0L
    var compact: Array[Byte] = null
    var chunkDims: Array[Int] = null
    var btree = Undef
    var filters: Seq[Filter] = Nil
    // layout v4 chunk-index state (HDF5 File Format Spec IV.A.2.i)
    var v4IdxType = 0
    var v4Flags = 0
    var v4SingleSize = 0L
    var v4SingleMask = 0
    // virtual dataset (layout class 3) mapping-blob location
    var vdsGheap = Undef
    var vdsIdx = 0
    val attrs = scala.collection.mutable.Map[String, Any]()

    msgs.foreach {
      case (0x01, off) => dims = parseDs(in, off)._2
      case (0x03, off) =>
        dt = parseDt(in, off)
        if (dt.cls == 8) {
          // classification semantics travel with the data: surface the
          // member table CF-style (flag_values/flag_meanings)
          val members = enumMembers(in, off)
          attrs += ("flag_values" -> members.map(_._2).mkString(" "))
          attrs += ("flag_meanings" -> members.map(_._1).mkString(" "))
        }
      case (0x05, off) =>
        // a fill value is at most one element (8 bytes numeric, 16
        // vlen) — cap the slice so a corrupt size never allocates big
        def take(at: Long, sz: Int): Unit =
          if (sz > 0 && sz <= 64) fillRaw = Some(in.slice(at, sz))
        val ver = in(off) & 0xff
        if (ver == 1) {
          // v1 has NO 'defined' byte: version, space-alloc, write-time,
          // size(4), value — reading it with the v2 layout would take
          // the size's first byte as the flag and misparse every v1 fill
          take(off + 7, in.getInt(off + 3))
        } else if (ver == 2) { // v2 adds the 'fill value defined' byte
          if ((in(off + 3) & 0xff) == 1) take(off + 8, in.getInt(off + 4))
        } else { // v3: flags bit 5 = fill value defined
          if ((in(off + 1) & 0x20) != 0) take(off + 6, in.getInt(off + 2))
        }
      case (0x08, off) =>
        val ver = in(off) & 0xff
        require(ver == 3 || ver == 4, s"only layout message v3/v4 supported, got v$ver")
        layoutVer = ver
        layoutClass = in(off + 1) & 0xff
        (ver, layoutClass) match {
          case (_, 0) => // compact: size(2) + data — same shape in v3/v4
            val sz = in.getShort(off + 2) & 0xffff
            compact = in.slice(off + 4, sz)
          case (_, 1) =>
            dataAddr = in.getLong(off + 2); dataSize = in.getLong(off + 10)
          case (3, 2) =>
            val ndim = in(off + 2) & 0xff
            btree = in.getLong(off + 3)
            chunkDims = (0 until ndim).map(i => in.getInt(off + 11 + i * 4)).toArray
          case (4, 2) =>
            // v4 chunked (HDF5 ≥1.10): flags(1), dimensionality(1,
            // rank+1 incl. the element-size dim — same convention as
            // v3), dim-size encoded length(1), dims, chunk indexing
            // type(1), type-specific info, index address(8). FA/EA/BT2
            // geometry is re-stated inside the index structures
            // themselves, so only the single-chunk fields are kept.
            v4Flags = in(off + 2) & 0xff
            val ndim = in(off + 3) & 0xff
            val encLen = in(off + 4) & 0xff
            require(encLen >= 1 && encLen <= 8, s"bad v4 dim encoding length $encLen")
            var p = off + 5
            chunkDims = (0 until ndim).map { _ =>
              var v = 0L; var i = 0
              while (i < encLen) { v |= (in(p + i) & 0xffL) << (8 * i); i += 1 }
              p += encLen
              require(v > 0 && v <= Int.MaxValue, s"bad v4 chunk dim $v")
              v.toInt
            }.toArray
            v4IdxType = in(p) & 0xff; p += 1
            v4IdxType match {
              case 1 => // single chunk: filtered variant carries size+mask
                if ((v4Flags & 2) != 0) {
                  v4SingleSize = in.getLong(p); p += 8
                  v4SingleMask = in.getInt(p); p += 4
                }
              case 2 => // implicit: no config
              case 3 => p += 1 // fixed array: page bits (FAHD restates)
              case 4 => p += 5 // extensible array: 5 param bytes (EAHD restates)
              case 5 => p += 6 // v2 B-tree: node size(4)+split(1)+merge(1) (BTHD restates)
              case t => throw new IllegalArgumentException(
                s"unsupported v4 chunk index type $t")
            }
            btree = in.getLong(p) // index (or single-chunk) address
          case (_, 3) => // virtual dataset: (gheap address, index) of
            // the mapping blob; resolution happens below once the
            // dataspace/datatype messages are in hand
            vdsGheap = in.getLong(off + 2)
            vdsIdx = in.getInt(off + 10)
          case (_, c) => throw new IllegalArgumentException(s"unsupported layout class $c")
        }
      case (0x0B, off) =>
        filters = parseFilterPipeline(in, off)
      case (0x0C, off) => readAttr(in, off).foreach(attrs += _)
      case _ =>
    }
    require(dt != null, s"object at $addr is not a dataset")
    require(dt.cls == 0 || dt.cls == 1 || dt.cls == 2 || dt.cls == 3 ||
      dt.cls == 4 || dt.cls == 8 ||
      (dt.cls == 9 && dt.base.exists(_.cls == 3)) ||
      (dt.cls == 6 && dt.members.forall(m => m._3.cls == 0 || m._3.cls == 1)),
      s"unsupported dataset datatype class ${dt.cls} " +
        "(numeric, time, bitfield, enum, string, vlen-string and " +
        "numeric-member compound only)")
    // NOTE: the HDF5 fill MESSAGE is the allocation background, NOT a
    // missing-data sentinel — h5py files legitimately fill with 0 over
    // fully-written data, so injecting it as _FillValue would NaN real
    // zeros. Sentinel semantics come only from the _FillValue
    // ATTRIBUTE (what netcdf-c writes), matching h5py/xarray behavior.

    // cap on BYTES, not elements: the decode buffer is n * dt.size, so
    // an element-only cap would admit e.g. 772M float32s (a standard
    // ERA5 monthly granule) and wrap the allocation size negative
    require(dims.product.max(1) * dt.size <= Int.MaxValue,
      s"variable of ${dims.product} x ${dt.size}-byte elements exceeds the " +
        "materializing reader's 2 GiB cap (chunk-subset reads needed)")
    val n = dims.product.max(1).toInt

    if (layoutClass == 3) {
      // ---- virtual dataset (VDS, HDF5 ≥1.10): the data is a MAPPING
      // onto other datasets. Same-file sources ('.') resolve through
      // the normal group traversal; CROSS-FILE sources (the h5py/NWP
      // post-processing layout that aggregates member files into one
      // logical cube — reference reads them via h5netcdf,
      // formats/netcdf.py:33-366) resolve through the read's sibling
      // resolver, with an ABSENT member filling its region with the
      // fill value (HDF5's default VDS view). Both scatter by
      // serialized dataspace selection (ALL / hyperslab v1 / regular
      // hyperslab v2). Printf-pattern mappings ('%b' unlimited-
      // dimension VDS) fail loudly: their extent is defined by
      // directory ENUMERATION at open time, which the materializing
      // reader — whose shapes come from the declared dataspace —
      // cannot honor without silently truncating a growing cube.
      require(dt.cls == 0 || dt.cls == 1,
        "virtual STRING datasets not supported (numeric mappings only)")
      // a corrupt mapping can point a virtual dataset at itself (or a
      // chain of virtual datasets back to it) — unguarded recursion
      // would die with a StackOverflowError, an Error the quarantine
      // paths' `catch Exception` cannot contain, so ONE crafted
      // granule would kill the whole ingest job
      require(vdsDepth < 4,
        s"virtual-dataset mapping chain deeper than 4 at '$prefix' (cycle?)")
      val vdimsDecl = dims.map(_.toInt)
      val blob = gheapObject(in, vdsGheap, vdsIdx)
      val bb = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN)
      require((blob(0) & 0xff) == 0,
        s"unsupported VDS global heap block version ${blob(0) & 0xff}")
      val nMaps = bb.getLong(1)
      require(nMaps >= 0 && nMaps <= 65536, s"implausible VDS mapping count $nMaps")
      var p = 9
      def cstr(): String = {
        val s = p
        while (p < blob.length && blob(p) != 0) p += 1
        require(p < blob.length, "unterminated string in VDS mapping")
        val r = new String(blob, s, p - s, java.nio.charset.StandardCharsets.UTF_8)
        p += 1; r
      }
      // parse EVERY mapping before touching any source: printf-pattern
      // ('%b') mappings change the dataset's EXTENT, which sizes the
      // decode buffer
      val rawMaps = scala.collection.mutable.Buffer[(String, String, VSel, VSel)]()
      var k = 0L
      while (k < nMaps) {
        val srcFile = cstr(); val srcPath = cstr()
        val (srcSel, p1) = parseSelection(blob, p); p = p1
        val (virtSel, p2) = parseSelection(blob, p); p = p2
        require(!srcPath.contains("%b"),
          s"printf-pattern dataset-NAME mapping '$srcPath' not supported " +
            "(member-per-FILE '%b' layouts only)")
        rawMaps += ((srcFile, srcPath, srcSel, virtSel))
        k += 1
      }
      // ---- printf-pattern expansion: the h5py unlimited-dimension
      // member-per-file layout ("data_%b.h5"). The virtual selection is
      // a regular hyperslab with H5S_UNLIMITED count on one axis; block
      // b lives in the file with %b -> b. The extent is defined by
      // DIRECTORY ENUMERATION at open time (HDF5's H5D_VDS_FIRST_MISSING
      // view: members 0..N-1 until the first absent one), so it needs
      // the sibling resolver -- bytes-only entry points stay loud.
      val vdimsEff = vdimsDecl.toArray
      val expanded = rawMaps.flatMap {
        case (srcFile, srcPath, srcSel, u: VSelUnlim) =>
          require(srcFile.contains("%b"),
            "unlimited virtual selection without a printf-pattern source file")
          require(ctx.siblings.nonEmpty,
            s"printf-pattern virtual mapping to '$srcFile' needs directory " +
              "context (bytes-only entry point; ingest through " +
              "Formats.ingestDir / ingestLargePaths, which supply it)")
          val rank = u.st.length
          require(rank == vdimsEff.length,
            s"printf mapping rank $rank does not match dataset rank ${vdimsEff.length}")
          for (d <- 0 until rank if d != u.udim)
            require(u.cn(d) == 1,
              s"printf mapping with a repeated (count ${u.cn(d)}) bounded " +
                s"pattern in dim $d not supported (count 1 per bounded dim)")
          val members = scala.collection.mutable.Buffer[(String, String, VSel, VSel)]()
          var b = 0
          var miss = false
          while (!miss && b <= (1 << 20)) {
            val name = srcFile.replace("%b", b.toString)
            if (ctx.resolve(joinRel(fileTag, name)).isEmpty) miss = true
            else {
              val st2 = u.st.clone()
              st2(u.udim) = u.st(u.udim) + b.toLong * u.sd(u.udim)
              members += ((name, srcPath, srcSel, VSelBlocks(Seq((st2, u.bl.clone())))))
              val need = st2(u.udim) + u.bl(u.udim)
              require(need <= Int.MaxValue, s"printf extent $need overflows")
              if (need > vdimsEff(u.udim)) vdimsEff(u.udim) = need.toInt
              b += 1
            }
          }
          // the loop must END on a missing member, not on the cap — a
          // layout with >2^20 member files would otherwise silently
          // truncate the unlimited extent (the decode cap need not fire
          // first for small members)
          require(miss,
            s"printf-pattern virtual mapping '$srcFile' exceeds the 2^20 " +
              "member enumeration cap -- refusing to return a truncated cube")
          // zero members = a granule whose whole cube would silently be
          // fill values; that is a broken drop, not an empty dataset
          require(members.nonEmpty,
            s"printf-pattern virtual mapping '$srcFile' resolved no members " +
              "(file for block 0 absent) -- refusing to return an all-fill cube")
          members
        case m =>
          // a printf file name with a BOUNDED virtual selection is not
          // a form any writer emits — resolving the '%b' literally
          // would silently fill the region
          require(!m._1.contains("%b"),
            s"printf-pattern source file '${m._1}' with a bounded virtual " +
              "selection not supported (unlimited-dimension mappings only)")
          Seq(m)
      }
      // re-check the decode cap against the ENUMERATED extent
      require(vdimsEff.map(_.toLong).product.max(1) * 4 <= Int.MaxValue,
        s"virtual dataset of ${vdimsEff.mkString("x")} elements exceeds the " +
          "materializing reader's 2 GiB cap")
      val nEff = vdimsEff.map(_.toLong).product.max(1).toInt
      val data = new Array[Float](nEff)
      val fv = fillRaw.map(fb => element(ByteIn(fb), 0, dt)).getOrElse(0.0).toFloat
      java.util.Arrays.fill(data, fv)
      // mappings onto the SAME source decode it once, not per mapping
      val srcCache = scala.collection.mutable.Map[(String, Long), Dataset]()
      val srcNames = scala.collection.mutable.LinkedHashSet[String]()
      // cross-file sources, identified by (file tag, object address):
      // if the granule ALSO mounts the member file via an external
      // link, the link-surfaced dataset must be excluded too, or the
      // pixels surface twice (once through the virtual cube, once
      // through the mount)
      val srcXIds = scala.collection.mutable.LinkedHashSet[(String, Long)]()
      expanded.foreach { case (srcFile, srcPath, srcSelV, virtSelV) =>
        val srcSel = boundedSel(srcSelV, "source")
        val virtSel = boundedSel(virtSelV, "virtual")
        // (sibling ByteIn, that file's root): same file reuses this read's
        // cross-file member names resolve relative to the REFERRING
        // file's directory (this dataset may itself live in an
        // externally-linked sibling)
        val srcTag = if (srcFile == ".") fileTag else joinRel(fileTag, srcFile)
        val resolved: Option[(ByteIn, Long)] =
          if (srcFile == ".") Some((in, rootAddr))
          else {
            require(ctx.siblings.nonEmpty,
              s"cross-file virtual mapping to '$srcFile' needs directory " +
                "context (bytes-only entry point; ingest through " +
                "Formats.ingestDir / ingestLargePaths, which supply it)")
            ctx.resolve(srcTag) // None = absent member -> fill region
          }
        resolved.foreach { case (sIn, sRoot) =>
          val srcAddr = resolvePath(sIn, sRoot, sRoot, srcPath, 0).getOrElse(
            throw new IllegalArgumentException(
              s"virtual mapping source '$srcPath' not found" +
                (if (srcFile == ".") "" else s" in '$srcFile'")))
          // exclusion matches SURFACED names, which carry the traversal
          // prefix this file's root was entered under
          if (srcFile == ".") srcNames += rootPrefix + srcPath.stripPrefix("/")
          else srcXIds += ((srcTag, srcAddr))
          val src = srcCache.getOrElseUpdate((srcTag, srcAddr),
            readDataset(sIn, srcAddr, srcPath.stripPrefix("/"),
              messages(sIn, srcAddr), sRoot, vdsDepth + 1, ctx, srcTag))
          val sIdx = selIndices(srcSel, src.shape.toArray)
          val vIdx = selIndices(virtSel, vdimsEff)
          require(sIdx.length == vIdx.length,
            s"virtual mapping '$srcPath' selects ${sIdx.length} source elements " +
              s"for ${vIdx.length} virtual slots")
          var i = 0
          while (i < vIdx.length) { data(vIdx(i)) = src.data(sIdx(i)); i += 1 }
        }
      }
      // record the consumed sources so variable discovery can exclude
      // them -- they are storage internals of THIS dataset, and
      // surfacing them as grid variables would double-ingest the pixels
      attrs += ("_vds_sources" -> srcNames.toSeq)
      if (srcXIds.nonEmpty)
        attrs += ("_vds_xsources" -> srcXIds.toSeq.map { case (t, a) => s"$t\u0000$a" })
      return Seq(Dataset(prefix.stripSuffix("/"), addr, vdimsEff.toSeq, data,
        attrs.toMap, srcFile = fileTag))
    }

    val raw: Array[Byte] = layoutClass match {
      case 0 => compact
      case 1 =>
        if (dataAddr == Undef) null
        else {
          // corrupt headers can claim any size — guard before the
          // Int narrowing or the slice wraps to a short/negative read
          require(dataSize >= 0 && dataSize <= Int.MaxValue,
            s"contiguous dataset of $dataSize bytes exceeds the " +
              "materializing reader's 2 GiB cap")
          in.slice(dataAddr, dataSize.toInt)
        }
      case 2 =>
        val out = new Array[Byte](n * dt.size)
        fillRaw.foreach { fb =>
          var i = 0
          while (i < n) { System.arraycopy(fb, 0, out, i * dt.size, dt.size); i += 1 }
        }
        if (btree != Undef) {
          if (layoutVer == 3)
            readChunks(in, btree, dims.map(_.toInt).toArray, chunkDims, dt.size, filters, out)
          else
            readChunksV4(in, btree, dims.map(_.toInt).toArray, chunkDims,
              dt.size, filters, out, v4IdxType, v4Flags, v4SingleSize, v4SingleMask)
        }
        out
      case c => throw new IllegalArgumentException(s"no layout for dataset at $addr (class $c)")
    }
    if (dt.cls == 3) {
      // fixed-length strings as NC_CHAR-style char codes. netcdf-c
      // stores NC_CHAR data as size-1 strings with the string-length
      // axis as a REAL dimension, so size 1 keeps the shape; h5py-style
      // width-W strings fold the width into the type, so it surfaces
      // as a synthetic trailing axis.
      val total = n * dt.size
      val data = new Array[Float](total)
      if (raw != null) {
        var i = 0
        while (i < math.min(total, raw.length)) { data(i) = (raw(i) & 0xff).toFloat; i += 1 }
      }
      val shape = if (dt.size == 1) dims.map(_.toInt) else dims.map(_.toInt) :+ dt.size
      Seq(Dataset(prefix.stripSuffix("/"), addr, shape, data, attrs.toMap,
        isChar = true, srcFile = fileTag))
    } else if (dt.cls == 9) {
      // vlen strings (the netcdf-4 NC_STRING / h5py str form): each
      // 16-byte element is (length u32, global-heap address u64,
      // heap index u32); pad to the longest string for the char-code
      // surface.
      require(dt.size == 16, s"vlen element size ${dt.size}, expected 16")
      val strs = new Array[Array[Byte]](n)
      var w = 1
      var i = 0
      while (i < n) {
        strs(i) =
          if (raw == null) Array.emptyByteArray
          else {
            val rbb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
            val len = rbb.getInt(i * 16)
            if (len <= 0) Array.emptyByteArray
            else {
              val p = gheapObject(in, rbb.getLong(i * 16 + 4), rbb.getInt(i * 16 + 12))
              java.util.Arrays.copyOfRange(p, 0, math.min(len, p.length))
            }
          }
        w = math.max(w, strs(i).length)
        i += 1
      }
      val data = new Array[Float](n * w)
      i = 0
      while (i < n) {
        var j = 0
        while (j < strs(i).length) { data(i * w + j) = (strs(i)(j) & 0xff).toFloat; j += 1 }
        i += 1
      }
      Seq(Dataset(prefix.stripSuffix("/"), addr, dims.map(_.toInt) :+ w, data,
        attrs.toMap, isChar = true, srcFile = fileTag))
    } else if (dt.cls == 6) {
      // compound: each numeric member flattens to its own variable,
      // named <dataset>.<member> (the h5py structured-array fields /
      // HDF-EOS table columns, surfaced relationally)
      val rin = if (raw == null) null else ByteIn(raw)
      val fin = fillRaw.map(ByteIn(_)).orNull
      dt.members.map { case (mname, moff, mdt, mdims) =>
        // array-valued members (v1 dimensionality) append their dims
        // to the dataset shape; k inner elements sit contiguously at
        // the member's offset inside each compound element
        val k = mdims.product.max(1)
        val data = new Array[Float](n * k)
        if (rin == null) {
          var j = 0
          while (j < n * k) {
            data(j) = (if (fin == null) 0.0
                       else element(fin, moff.toLong + (j % k) * mdt.size, mdt)).toFloat
            j += 1
          }
        } else {
          var i = 0
          while (i < n) {
            var j = 0
            while (j < k) {
              data(i * k + j) =
                element(rin, i.toLong * dt.size + moff + j.toLong * mdt.size, mdt).toFloat
              j += 1
            }
            i += 1
          }
        }
        Dataset(prefix.stripSuffix("/") + "." + mname, addr,
          dims.map(_.toInt) ++ mdims, data, attrs.toMap, srcFile = fileTag)
      }
    } else {
      val data = new Array[Float](n)
      if (raw == null) {
        val fv = fillRaw.map(fb =>
          element(ByteIn(fb), 0, dt)).getOrElse(0.0)
        java.util.Arrays.fill(data, fv.toFloat)
      } else {
        val rin = ByteIn(raw)
        var i = 0
        while (i < n) { data(i) = element(rin, i.toLong * dt.size, dt).toFloat; i += 1 }
      }
      Seq(Dataset(prefix.stripSuffix("/"), addr, dims.map(_.toInt), data, attrs.toMap,
        srcFile = fileTag))
    }
  }

  /** Walk a v1 B-tree of raw data chunks, decompress, and scatter each
    * chunk into the row-major output (clipping partial edge chunks). */
  private def readChunks(in: ByteIn, addr: Long, dims: Array[Int],
                         chunkDims: Array[Int], elemSize: Int, filters: Seq[Filter],
                         out: Array[Byte]): Unit = {
    val a = addr
    require(in(a) == 'T' && in(a + 1) == 'R', s"expected TREE at $addr")
    require((in(a + 4) & 0xff) == 1, "expected chunk btree (type 1)")
    val level = in(a + 5) & 0xff
    val n = in.getShort(a + 6) & 0xffff
    val rank = dims.length
    val keySize = 8 + (rank + 1) * 8
    var p = a + 24
    for (_ <- 0 until n) {
      val nbytes = in.getInt(p)
      val mask = in.getInt(p + 4)
      val offs = (0 until rank).map(i => in.getLong(p + 8 + i * 8).toInt).toArray
      val child = in.getLong(p + keySize)
      p += keySize + 8
      if (level > 0) readChunks(in, child, dims, chunkDims, elemSize, filters, out)
      else {
        val c = child
        // chunkDims carries the trailing element-size dim (layout v3
        // convention) — the raw byte count is the rank-many pixel dims
        // times the element size
        val rawSize = chunkDims.take(dims.length).map(_.toLong).product * elemSize
        require(rawSize <= Int.MaxValue, s"chunk larger than 2 GiB ($rawSize bytes)")
        val chunk = defilter(in.slice(c, nbytes), filters, mask, elemSize,
          rawSize.toInt)
        scatter(chunk, offs, dims, chunkDims, elemSize, out)
      }
    }
  }

  /** One pipeline entry: filter id + its client-data values (szip
    * needs cd[0..3]; the rest ignore them). */
  case class Filter(id: Int, cd: Array[Int])

  /** Parse a Filter Pipeline message (v1/v2) body into (id, client
    * data) entries — shared by the dataset 0x0B message and the
    * fractal-heap I/O filter info. */
  private def parseFilterPipeline(in: ByteIn, off: Long): Seq[Filter] = {
    val ver = in(off) & 0xff
    val nf = in(off + 1) & 0xff
    var p = off + (if (ver == 1) 8 else 2)
    (0 until nf).map { _ =>
      val id = in.getShort(p) & 0xffff
      val nameLen = if (ver == 1 || id >= 256) in.getShort(p + 2) & 0xffff else 0
      val nClient = in.getShort(p + 6) & 0xffff
      val cdAt = p + 8 + (if (ver == 1) ((nameLen + 7) / 8) * 8 else nameLen)
      val cd = (0 until nClient).map(i => in.getInt(cdAt + 4L * i)).toArray
      p = cdAt + 4 * nClient
      if (ver == 1 && nClient % 2 == 1) p += 4
      Filter(id, cd)
    }
  }

  /** Apply the filter pipeline to one raw chunk on read (reverse
    * order, honoring the per-chunk skip mask). `rawSize` is the
    * expected unfiltered byte count — szip needs it for its sample
    * count (−1 where the caller cannot know it, e.g. heap blocks). */
  private def defilter(chunkIn: Array[Byte], filters: Seq[Filter], mask: Int,
                       elemSize: Int, rawSize: Int = -1): Array[Byte] = {
    var chunk = chunkIn
    filters.zipWithIndex.reverse.foreach { case (f, i) =>
      if ((mask & (1 << i)) == 0) chunk = f.id match {
        case 1 => inflate(chunk)
        case 2 => unshuffle(chunk, elemSize)
        case 3 => fletcherStrip(chunk)
        case 4 => Szip.decode(chunk, f.cd, rawSize, elemSize)
        case 5 => H5Packed.nbitDecode(chunk, f.cd)
        case 6 => H5Packed.scaleoffsetDecode(chunk, f.cd)
        case id => throw new IllegalArgumentException(s"unsupported filter $id")
      }
    }
    chunk
  }

  /** Read a layout-v4 chunked dataset through its chunk index (HDF5
    * ≥1.10 files — the reference reads them transparently via
    * h5netcdf, formats/netcdf.py:33-366). Index types per the HDF5
    * File Format Spec v3:
    *   1 Single Chunk — the address IS the one chunk (filtered size +
    *     mask live in the layout message);
    *   2 Implicit — unfiltered chunks back-to-back at the address in
    *     chunk-linear (row-major grid) order, early-allocated;
    *   3 Fixed Array (spec III.G) — FAHD header + FADB data block,
    *     paged and unpaged; elements are chunk addresses (client 0)
    *     or address+size+filter-mask (client 1);
    *   4 Extensible Array (spec III.F) — EAHD header + EAIB index
    *     block; elements inline in the index block plus the two data
    *     blocks (EADB) the index block addresses directly (the first
    *     two super blocks, H5EA geometry: sblk u holds 2^(u/2) data
    *     blocks of min_elmts·2^((u+1)/2) elements). Secondary/super
    *     blocks and paged data blocks fail loudly.
    *   5 Version-2 B-tree — BTHD walk (shared with the dense-group
    *     name index), record type 10 (address + scaled offsets) or 11
    *     (+ variable-width size + filter mask).
    */
  private def readChunksV4(in: ByteIn, idxAddr: Long,
                           dims: Array[Int], chunkDims: Array[Int], elemSize: Int,
                           filters: Seq[Filter], out: Array[Byte],
                           idxType: Int, flags: Int,
                           singleSize: Long, singleMask: Int): Unit = {
    val rank = dims.length
    def uLE(at: Long, n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v |= (in(at + i) & 0xffL) << (8 * i); i += 1 }
      v
    }
    def sig4(a: Long, sig: String): Unit =
      require((0 until 4).forall(i => in(a + i) == sig.charAt(i).toByte),
        s"expected $sig at file offset $a")
    val grid = (0 until rank).map(i => (dims(i) + chunkDims(i) - 1) / chunkDims(i)).toArray
    val nChunks = grid.map(_.toLong).product
    require(nChunks <= Int.MaxValue, s"implausible chunk count $nChunks")
    val nominal = chunkDims.take(rank).map(_.toLong).product * elemSize
    require(nominal <= Int.MaxValue, s"chunk larger than 2 GiB ($nominal bytes)")
    def offsOf(ci: Int): Array[Int] = {
      val o = new Array[Int](rank)
      var rem = ci
      var d = rank - 1
      while (d >= 0) { o(d) = (rem % grid(d)) * chunkDims(d); rem /= grid(d); d -= 1 }
      o
    }
    def place(offs: Array[Int], addr: Long, size: Long, mask: Int, filtered: Boolean): Unit = {
      if (addr == Undef) return // unallocated chunk keeps the fill value
      val c = addr
      var chunk = in.slice(c, size.toInt)
      if (filtered) chunk = defilter(chunk, filters, mask, elemSize, nominal.toInt)
      scatter(chunk, offs, dims, chunkDims, elemSize, out)
    }
    // FA/EA element: client 0 = chunk address only (unfiltered); client
    // 1 = address(8) + chunk size (element size − 12) + filter mask(4)
    def placeElement(ci: Int, at: Long, elmtSize: Int, clientId: Int): Unit = {
      require(clientId == 0 || clientId == 1, s"unknown chunk-index client $clientId")
      if (clientId == 0) place(offsOf(ci), uLE(at, elmtSize), nominal, 0, filtered = false)
      else {
        val szW = elmtSize - 12
        require(szW >= 1 && szW <= 8, s"bad filtered element size $elmtSize")
        place(offsOf(ci), in.getLong(at), uLE(at + 8, szW), in.getInt(at + 8 + szW),
          filtered = true)
      }
    }

    idxType match {
      case 1 => // single chunk
        require(nChunks == 1, s"single-chunk index with $nChunks chunks")
        if ((flags & 2) != 0) place(offsOf(0), idxAddr, singleSize, singleMask, filtered = true)
        else place(offsOf(0), idxAddr, nominal, 0, filtered = false)

      case 2 => // implicit: unfiltered, early-allocated, chunk-linear
        var ci = 0
        while (ci < nChunks) {
          place(offsOf(ci), idxAddr + ci * nominal, nominal, 0, filtered = false)
          ci += 1
        }

      case 3 => // fixed array
        val a = idxAddr; sig4(a, "FAHD")
        val clientId = in(a + 5) & 0xff
        val entrySize = in(a + 6) & 0xff
        val pageBits = in(a + 7) & 0xff
        val maxEntries = in.getLong(a + 8)
        val dbAddr = in.getLong(a + 16)
        require(maxEntries == nChunks,
          s"fixed-array entry count $maxEntries != chunk count $nChunks")
        if (dbAddr != Undef) {
          val d0 = (dbAddr); sig4(d0, "FADB")
          var p = d0 + 6 + 8 // ver(1) + client(1) + header address(8)
          val pageN = 1L << pageBits
          if (maxEntries > pageN) { // paged data block
            val nPages = ((maxEntries + pageN - 1) / pageN).toInt
            p += (nPages + 7) / 8 // page-init bitmap
            p += 4 // data-block PREFIX checksum (H5FA: before the pages)
            var ci = 0
            for (pg <- 0 until nPages) {
              val inPage = math.min(pageN, maxEntries - pg.toLong * pageN).toInt
              for (_ <- 0 until inPage) { placeElement(ci, p, entrySize, clientId); p += entrySize; ci += 1 }
              p += 4 // per-page checksum
            }
          } else {
            var ci = 0
            while (ci < maxEntries) { placeElement(ci, p, entrySize, clientId); p += entrySize; ci += 1 }
          }
        }

      case 4 => // extensible array
        val a = idxAddr; sig4(a, "EAHD")
        val clientId = in(a + 5) & 0xff
        val elmtSize = in(a + 6) & 0xff
        val maxNelmtsBits = in(a + 7) & 0xff
        val idxBlkElmts = in(a + 8) & 0xff
        val dblkMinElmts = in(a + 9) & 0xff
        // a+10 = secondary-block min data ptrs, a+11 = dblk page bits
        val dblkPageN = 1L << (in(a + 11) & 0xff)
        val idxBlkAddr = in.getLong(a + 12 + 48) // after the six 8-byte length fields
        require(dblkMinElmts > 0 && (dblkMinElmts & (dblkMinElmts - 1)) == 0,
          s"extensible-array data block min elements $dblkMinElmts must be a power of 2")
        // H5EA geometry: super block u holds 2^(u/2) data blocks of
        // dblkMinElmts·2^((u+1)/2) elements; the index block addresses
        // the data blocks of super blocks 0-1 directly, then the super
        // blocks themselves (nsblks = 1 + maxNelmtsBits − log2(min))
        val nsblks = 1 + maxNelmtsBits -
          (31 - Integer.numberOfLeadingZeros(dblkMinElmts))
        val blkOffW = (maxNelmtsBits + 7) / 8
        def dblkNelmts(u: Int): Long = dblkMinElmts.toLong << ((u + 1) / 2)
        if (idxBlkAddr != Undef) {
          val ib = idxBlkAddr; sig4(ib, "EAIB")
          var p = ib + 6 + 8 // ver(1) + client(1) + header address(8)
          var ci = 0L
          // the index block always holds its full idxBlkElmts capacity
          while (ci < idxBlkElmts) {
            if (ci < nChunks) placeElement(ci.toInt, p, elmtSize, clientId)
            p += elmtSize; ci += 1
          }
          // one data block's elements; Undef address = unallocated,
          // those chunks keep the fill value. A block larger than the
          // page size stores its elements in PAGES of dblkPageN
          // elements, each followed by a 4-byte checksum, directly
          // after the block header.
          def readDblk(dAddr: Long, cap: Long): Unit =
            if (dAddr == Undef) ci += cap
            else {
              val db = (dAddr); sig4(db, "EADB")
              var q = db + 6 + 8 + blkOffW // ver + client + hdr addr + block offset
              if (cap > dblkPageN) q += 4 // paged: PREFIX checksum before page 0
              if (cap <= dblkPageN) {
                var i = 0L
                while (i < cap) {
                  if (ci < nChunks) placeElement(ci.toInt, q, elmtSize, clientId)
                  q += elmtSize; ci += 1; i += 1
                }
              } else {
                val nPages = ((cap + dblkPageN - 1) / dblkPageN).toInt
                for (pg <- 0 until nPages) {
                  val inPage = math.min(dblkPageN, cap - pg.toLong * dblkPageN)
                  var i = 0L
                  while (i < inPage) {
                    if (ci < nChunks) placeElement(ci.toInt, q, elmtSize, clientId)
                    q += elmtSize; ci += 1; i += 1
                  }
                  q += 4 // per-page checksum
                }
              }
            }
          // direct data blocks (super blocks 0 and 1: one block each)
          for (u <- 0 to 1) {
            val dAddr = in.getLong(p); p += 8
            if (ci < nChunks) readDblk(dAddr, dblkNelmts(u)) else ci += dblkNelmts(u)
          }
          // super blocks 2..nsblks: EASB holding its data block addresses
          var u = 2
          while (u < nsblks && ci < nChunks) {
            val cap = dblkNelmts(u)
            val ndblks = 1 << (u / 2)
            val sAddr = in.getLong(p); p += 8
            if (sAddr == Undef) ci += ndblks.toLong * cap
            else {
              val sb = (sAddr); sig4(sb, "EASB")
              var q = sb + 6 + 8 + blkOffW // ver + client + hdr addr + block offset
              if (cap > dblkPageN) {
                // paged data blocks: the super block carries a
                // page-init bitmap (ndblks x pages-per-dblk bits)
                // between the block offset and the addresses
                val npg = ((cap + dblkPageN - 1) / dblkPageN).toInt
                q += (ndblks.toLong * npg + 7) / 8
              }
              for (_ <- 0 until ndblks) {
                val dAddr = in.getLong(q); q += 8
                if (ci < nChunks) readDblk(dAddr, cap) else ci += cap
              }
            }
            u += 1
          }
          require(ci >= nChunks,
            s"extensible-array index exhausted at chunk $ci of $nChunks " +
              s"($nsblks super blocks — corrupt header?)")
        }

      case 5 => // version-2 B-tree of chunk records
        walkBtreeV2(in, idxAddr) { (recAt, recSize) =>
          // type 10: address(8) + rank scaled offsets (8 each);
          // type 11: address(8) + size(recSize−12−8·rank) + mask(4) + offsets
          val szW = recSize - 12 - 8 * rank
          val filtered = szW >= 1
          require(filtered || recSize == 8 + 8 * rank,
            s"unrecognized chunk record size $recSize for rank $rank")
          val addr = in.getLong(recAt)
          val (size, mask, offBase) =
            if (filtered) (uLE(recAt + 8, szW), in.getInt(recAt + 8 + szW), recAt + 12 + szW)
            else (nominal, 0, recAt + 8)
          val offs = (0 until rank).map(i =>
            (in.getLong(offBase + i * 8) * chunkDims(i)).toInt).toArray
          place(offs, addr, size, mask, filtered)
        }

      case t => throw new IllegalArgumentException(s"unsupported v4 chunk index type $t")
    }
  }

  private def inflate(in: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(in)
    val out = new java.io.ByteArrayOutputStream(in.length * 4)
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val k = inf.inflate(buf)
      if (k == 0 && inf.needsInput()) throw new IllegalArgumentException("truncated deflate stream")
      out.write(buf, 0, k)
    }
    inf.end()
    out.toByteArray
  }

  /** HDF5 Fletcher-32 (filter id 3, H5_checksum_fletcher32): 16-bit
    * big-endian words, running sums folded mod 2^16−1 every 360 words
    * (the largest block that cannot overflow 32 bits), odd trailing
    * byte treated as the high byte of a final word. The filter stores
    * the checksum appended little-endian; verify and strip. */
  private[sources] def fletcher32(data: Array[Byte], len: Int): Long = {
    var sum1 = 0L; var sum2 = 0L
    var i = 0
    val words = len / 2
    var left = words
    while (left > 0) {
      var tlen = math.min(left, 360)
      left -= tlen
      while (tlen > 0) {
        sum1 += ((data(i) & 0xffL) << 8) | (data(i + 1) & 0xffL)
        sum2 += sum1
        i += 2; tlen -= 1
      }
      sum1 = (sum1 & 0xffff) + (sum1 >> 16)
      sum2 = (sum2 & 0xffff) + (sum2 >> 16)
    }
    if (len % 2 == 1) {
      sum1 += (data(len - 1) & 0xffL) << 8
      sum2 += sum1
      sum1 = (sum1 & 0xffff) + (sum1 >> 16)
      sum2 = (sum2 & 0xffff) + (sum2 >> 16)
    }
    sum1 = (sum1 & 0xffff) + (sum1 >> 16)
    sum2 = (sum2 & 0xffff) + (sum2 >> 16)
    ((sum2 & 0xffff) << 16) | (sum1 & 0xffff)
  }

  private def fletcherStrip(chunk: Array[Byte]): Array[Byte] = {
    require(chunk.length >= 4, "fletcher32 chunk shorter than its checksum")
    val n = chunk.length - 4
    val stored = (chunk(n) & 0xffL) | ((chunk(n + 1) & 0xffL) << 8) |
      ((chunk(n + 2) & 0xffL) << 16) | ((chunk(n + 3) & 0xffL) << 24)
    val computed = fletcher32(chunk, n)
    require(computed == stored,
      f"fletcher32 checksum mismatch: stored 0x$stored%08x, computed 0x$computed%08x " +
        "(corrupt chunk)")
    java.util.Arrays.copyOfRange(chunk, 0, n)
  }

  private def unshuffle(in: Array[Byte], elemSize: Int): Array[Byte] = {
    if (elemSize <= 1) return in
    val n = in.length / elemSize
    val out = new Array[Byte](in.length)
    var b = 0
    while (b < elemSize) {
      var i = 0
      while (i < n) { out(i * elemSize + b) = in(b * n + i); i += 1 }
      b += 1
    }
    out
  }

  private def scatter(chunk: Array[Byte], offs: Array[Int], dims: Array[Int],
                      chunkDims: Array[Int], elemSize: Int, out: Array[Byte]): Unit = {
    val rank = dims.length
    val strides = new Array[Long](rank)
    var s = 1L
    for (i <- (rank - 1) to 0 by -1) { strides(i) = s; s *= dims(i) }
    val cTotal = chunkDims.take(rank).product
    val coord = new Array[Int](rank)
    var ci = 0
    while (ci < cTotal) {
      var rem = ci
      var inBounds = true
      var outIdx = 0L
      for (d <- (rank - 1) to 0 by -1) {
        coord(d) = rem % chunkDims(d); rem /= chunkDims(d)
      }
      for (d <- 0 until rank) {
        val g = offs(d) + coord(d)
        if (g >= dims(d)) inBounds = false else outIdx += g * strides(d)
      }
      if (inBounds)
        System.arraycopy(chunk, ci * elemSize, out, outIdx.toInt * elemSize, elemSize)
      ci += 1
    }
  }

  // ================= NetCDF-4 assembly ==============================

  /** Interpret an HDF5 file through the NetCDF-4 dimension-scale
    * conventions, producing the same model as the classic reader. */
  def toNetCdf(bytes: Array[Byte]): NetCdf.File = toNetCdf(ByteIn(bytes))

  def toNetCdf(in: ByteIn): NetCdf.File = toNetCdf(in, None)

  def toNetCdf(in: ByteIn, siblings: Option[Siblings]): NetCdf.File = {
    val raw0 = read(in, siblings)
    // datasets consumed as virtual-mapping sources are storage
    // internals of their virtual dataset — surfacing them as variables
    // would double-ingest the same pixels (once via the stack, once
    // per slice)
    val vdsSources: Set[String] = raw0.datasets.flatMap(
      _.attrs.get("_vds_sources") match {
        case Some(names: Seq[_]) => names.map(_.toString)
        case _ => Nil
      }).toSet
    // cross-file mapping sources, keyed (file tag, object address): a
    // granule that externally links a member file AND maps its datasets
    // via cross-file VDS would otherwise surface the member pixels
    // twice (once through the virtual cube, once through the mount)
    val vdsXSources: Set[(String, Long)] = raw0.datasets.flatMap(
      _.attrs.get("_vds_xsources") match {
        case Some(ids: Seq[_]) => ids.map { s =>
          val Array(t, a) = s.toString.split('\u0000'); (t, a.toLong)
        }
        case _ => Nil
      }).toSet
    val f = File(raw0.datasets.filterNot(d =>
        vdsSources.contains(d.name) || vdsXSources.contains((d.srcFile, d.addr)))
      .map(d => d.copy(attrs = d.attrs - "_vds_sources" - "_vds_xsources")))
    // object addresses are unique only WITHIN a file; external links
    // merge several files into one listing, so the reference map keys
    // on (source file, address) — a bare-address map would bind a
    // linked variable's DIMENSION_LIST to whatever main-file dataset
    // happens to share the offset
    val byAddr = f.datasets.map(d => (d.srcFile, d.addr) -> d.name).toMap
    val isScale = f.datasets
      .filter(_.attrs.get("CLASS").contains("DIMENSION_SCALE")).map(_.name).toSet
    // netcdf-c records dimension creation order in _Netcdf4Dimid; group
    // traversal order is name-sorted (SNOD), so restore it when present
    val dims = f.datasets.filter(d => isScale(d.name))
      .sortBy(d => d.attrs.get("_Netcdf4Dimid") match {
        case Some(v: Double) => v.toInt
        case _ => Int.MaxValue
      })
      .map(d => d.name -> d.shape.head)
    val dimBySize = dims.toMap.map(_.swap) // fallback resolution (first wins is fine: sizes differ in practice)
    // string datasets may need synthetic width dims (h5py-style fixed
    // strings and vlen strings fold the width into the type)
    val extraDims = scala.collection.mutable.LinkedHashMap[String, Int]()
    val vars = f.datasets.map { d =>
      val listed: Option[Seq[String]] = d.attrs.get("DIMENSION_LIST") match {
        case Some(refs: Seq[_]) =>
          val names = refs.map(r => byAddr.get((d.srcFile, r.asInstanceOf[Long])))
          if (names.forall(_.isDefined)) Some(names.map(_.get))
          else if (d.srcFile.nonEmpty)
            // a dataset mounted through an external link WITHOUT its
            // own dimension scales (only the variable was linked):
            // its refs point at unsurfaced objects in the sibling
            // file — fall back to size-based dim matching, the same
            // path a scale-less dataset takes
            None
          else throw new IllegalArgumentException(
            s"${d.name}: DIMENSION_LIST ref to unknown object")
        case _ => None
      }
      if (d.isChar) {
        val vdims: Seq[String] = listed match {
          case Some(names) if names.size == d.shape.size => names
          case Some(names) if names.size == d.shape.size - 1 =>
            val sd = s"${d.name}_strlen"
            extraDims(sd) = d.shape.last
            names :+ sd
          case Some(names) => throw new IllegalArgumentException(
            s"${d.name}: DIMENSION_LIST rank ${names.size} vs shape rank ${d.shape.size}")
          case None =>
            d.shape.zipWithIndex.map { case (sz, i) =>
              dimBySize.get(sz).filter(_ => i < d.shape.size - 1).getOrElse {
                val sd = if (i == d.shape.size - 1) s"${d.name}_strlen"
                         else s"${d.name}_dim$i"
                extraDims(sd) = sz; sd
              }
            }
        }
        NetCdf.Variable(d.name, vdims, d.data, None,
          d.attrs.collect { case (k, v: String) => k -> v }, Map.empty, ncType = 2)
      } else {
      val vdims: Seq[String] = listed match {
        case Some(names) if names.size == d.shape.size => names
        case Some(names) if names.size < d.shape.size =>
          // trailing axes folded into the element type (array-valued
          // compound members): the dataset's DIMENSION_LIST names only
          // the leading axes — synthesize names for the rest
          names ++ d.shape.drop(names.size).zipWithIndex.map { case (sz, i) =>
            val sd = s"${d.name.replace('.', '_')}_dim${names.size + i}"
            extraDims(sd) = sz; sd
          }
        case Some(names) => throw new IllegalArgumentException(
          s"${d.name}: DIMENSION_LIST rank ${names.size} vs shape rank ${d.shape.size}")
        case _ if isScale(d.name) => Seq(d.name)
        case _ => d.shape.map(sz => dimBySize.getOrElse(sz,
          throw new IllegalArgumentException(s"${d.name}: no dimension of size $sz")))
      }
      val fillRaw = d.attrs.get("_FillValue").collect { case v: Double => v }
      val strAttrs = d.attrs.collect { case (k, v: String) => k -> v }
      // scalar numeric attrs, minus HDF5/netcdf-4 INTERNAL bookkeeping
      // (_Netcdf4Dimid etc.) — those must not leak onto the exchange
      // Variable where a re-export would duplicate them
      val numAttrs = d.attrs.collect {
        case (k, v: Double) if k != "_FillValue" && !k.startsWith("_Netcdf4") =>
          k -> v }
      // CF packing — same contract as the classic reader: unscale in
      // the reader, sentinel compared RAW and NaN'd before scaling,
      // fill cleared and the packing attrs dropped (the unpacked
      // Variable is float data; keeping them would double-apply on a
      // write∘read round trip)
      val scale = numAttrs.getOrElse("scale_factor", 1.0)
      val offs = numAttrs.getOrElse("add_offset", 0.0)
      val packed = scale != 1.0 || offs != 0.0
      val data =
        if (!packed) d.data
        else d.data.map(r =>
          if (fillRaw.exists(_.toFloat == r)) Float.NaN
          else (r * scale + offs).toFloat)
      NetCdf.Variable(d.name, vdims, data,
        if (packed) None else fillRaw.map(_.toFloat), strAttrs,
        if (packed) numAttrs - "scale_factor" - "add_offset" else numAttrs)
      }
    }
    NetCdf.File(dims ++ extraDims.toSeq, vars)
  }

  // ================= fixture writer =================================

  /** szip client data the fixture writer stores and encodes with:
    * RAW|NN|LSB options, 16-bit samples, 16 pixels/block, 32/scanline. */
  val SzipFixtureCd: Array[Int] = Array(
    Szip.MaskRaw | Szip.MaskNn | Szip.MaskLsb, 16, 16, 32)

  /** 32-bit szip client data (float datasets, the EOS-product shape):
    * RAW|NN|LSB options, 32 bits/pixel, 16 pixels/block, 32/scanline —
    * decoded through the byte-plane recode ([[Szip]] scaladoc). */
  val Szip32FixtureCd: Array[Int] = Array(
    Szip.MaskRaw | Szip.MaskNn | Szip.MaskLsb, 32, 16, 32)

  /** Write a NetCDF-4 file in netcdf-c's default shape: superblock v0,
    * v1 object headers, symbol-table root group; one dataset per
    * dimension (the coordinate variable's data when one exists, with
    * CLASS=DIMENSION_SCALE), contiguous coordinate storage; data
    * variables chunked (one timestep per chunk, rows split to force a
    * partial edge chunk) behind deflate, with DIMENSION_LIST references
    * through a global heap and both a fill-value message and a
    * _FillValue attribute. */
  /** `layoutV4`: emit the data variables with a LAYOUT MESSAGE v4 and
    * the given chunk index type (1 single, 2 implicit, 3 fixed array,
    * 4 extensible array, 5 v2 B-tree) — the HDF5 ≥1.10 layouts h5py
    * `libver='latest'` / `H5Pset_libver_bounds` produce. `v4Unfiltered`
    * stores raw chunks with no filter pipeline (forced for implicit,
    * which the format defines as unfiltered); `v4PageBits` sizes the
    * fixed-array pages (small values force the paged data block). */
  /** `subgroup`: place every DATA variable inside a named child group
    * (dimension scales stay at the root — the netcdf-c nested-group
    * shape, where child variables reference parent dims through
    * DIMENSION_LIST object addresses). */
  /** `szip`: store the data variables as int16 datasets behind the
    * szip filter (NN + LSB options, 16 pixels/block, 32/scanline) —
    * the ERA5-class packed-short layout a szip-enabled netcdf-c
    * emits. Values must fit non-negative 16-bit; fill must be None
    * (the spec fixtures hold both). */
  /** `szip32`: keep the data variables FLOAT (4-byte) behind a 32-bpp
    * szip pipeline — the layout szlib recodes as byte planes. */
  def write(dims: Seq[(String, Int)], variables: Seq[NetCdf.Variable],
            shuffle: Boolean = false, denseRoot: Boolean = false,
            szip: Boolean = false, szip32: Boolean = false,
            fletcher: Boolean = false, layoutV4: Option[Int] = None,
            v4Unfiltered: Boolean = false, v4PageBits: Int = 10,
            eaPageBits: Int = 10, subgroup: Option[String] = None,
            filteredHeap: Boolean = false,
            denseIdStyle: String = "managed",
            softLinks: Seq[(String, String)] = Nil,
            externalLinks: Seq[(String, String, String)] = Nil,
            vlenStr: Boolean = false,
            virtualStack: Boolean = false,
            virtualCrossFiles: Seq[(String, String)] = Nil,
            virtualPrintf: Option[String] = None,
            opaqueExtra: Boolean = false,
            bitfieldExtra: Boolean = false,
            timeExtra: Boolean = false,
            nbitPrecision: Option[Int] = None,
            scaleOffsetInt: Boolean = false,
            scaleOffsetDScale: Option[Int] = None,
            enumVars: Map[String, Seq[String]] = Map.empty,
            compoundVars: Map[String, Seq[(String, String)]] = Map.empty): Array[Byte] = {
    require(virtualCrossFiles.isEmpty || virtualStack,
      "fixture writer: virtualCrossFiles implies virtualStack")
    // `virtualPrintf`: ONE unlimited-dimension printf mapping (h5py's
    // member-per-file "data_%b.h5" layout) instead of per-index
    // mappings; the dataspace declares extent 0 along the leading dim
    // so the reader must derive it by directory enumeration
    require(virtualPrintf.isEmpty || (virtualStack && virtualCrossFiles.isEmpty),
      "fixture writer: virtualPrintf is its own mapping form")
    // `compoundVars`: variable → member list (name, type ∈ i16/i32/
    // f32/f64); the variable stores as ONE contiguous compound dataset
    // (v1 compound datatype message), member j of element i read from
    // v.data(i·k + j).
    require(compoundVars.isEmpty || (layoutV4.isEmpty && !szip && !shuffle &&
      !fletcher && !virtualStack && enumVars.isEmpty),
      "fixture writer: compound variables store contiguous, no filters")
    // `nbitPrecision`: int16 data variables packed by the N-BIT filter
    // (id 5) to the given bit precision (offset 0 — the h5py shape).
    // `scaleOffsetInt`: int16 data variables behind the SCALE+OFFSET
    // filter (id 6) in integer mode (H5Z_SO_INT). `scaleOffsetDScale`:
    // float32 variables behind scale+offset D-scaling with the given
    // decimal scale factor.
    val packedFilter = nbitPrecision.isDefined || scaleOffsetInt ||
      scaleOffsetDScale.isDefined
    require(Seq(nbitPrecision.isDefined, scaleOffsetInt,
      scaleOffsetDScale.isDefined).count(identity) <= 1,
      "fixture writer: one packed filter at a time")
    require(!packedFilter || (!szip && !shuffle && !fletcher &&
      layoutV4.isEmpty && !virtualStack && enumVars.isEmpty),
      "fixture writer: nbit/scaleoffset are their own single-filter pipelines")
    nbitPrecision.foreach(p => require(p >= 2 && p < 16,
      s"nbit fixture precision $p (int16 range)"))
    require(softLinks.isEmpty || subgroup.isEmpty,
      "fixture writer: soft links + subgroup not combined")
    require(!virtualStack || (subgroup.isEmpty && !denseRoot && !szip &&
      layoutV4.isEmpty && !shuffle && !fletcher),
      "fixture writer: virtualStack is its own root-group layout")
    require(subgroup.isEmpty || !denseRoot,
      "fixture writer: subgroup + denseRoot not combined")
    require(!filteredHeap || denseRoot, "filteredHeap applies to dense roots")
    require(Set("managed", "tinyhuge", "hugebtree").contains(denseIdStyle),
      s"unknown denseIdStyle '$denseIdStyle'")
    require(denseIdStyle == "managed" ||
      (denseRoot && (denseIdStyle == "hugebtree" || !filteredHeap)),
      "tiny ID style applies to unfiltered dense roots " +
        "(filtered huge objects route via the hugebtree style)")
    require(!szip || (!shuffle && !fletcher && layoutV4.isEmpty),
      "fixture writer: szip is its own single-filter pipeline")
    require(!szip32 || (!szip && !shuffle && !fletcher && layoutV4.isEmpty),
      "fixture writer: szip32 is its own single-filter pipeline")
    val out = new java.io.ByteArrayOutputStream()
    def pos = out.size
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    def u32(v: Long): Unit = { u8(v.toInt); u8((v >> 8).toInt); u8((v >> 16).toInt); u8((v >> 24).toInt) }
    def u64(v: Long): Unit = { u32(v & 0xffffffffL); u32(v >>> 32) }
    def raw(b: Array[Byte]): Unit = out.write(b)
    def padTo8(): Unit = while (pos % 8 != 0) u8(0)

    def pad8(b: Array[Byte]): Array[Byte] =
      if (b.length % 8 == 0) b else java.util.Arrays.copyOf(b, ((b.length + 7) / 8) * 8)

    // little helpers building message bodies in isolation
    def bodyBuf(f: ByteBuffer => Unit, cap: Int): Array[Byte] = {
      val bb = ByteBuffer.allocate(cap).order(ByteOrder.LITTLE_ENDIAN)
      f(bb)
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }
    def dataspaceMsg(shape: Seq[Int]): Array[Byte] = bodyBuf({ bb =>
      bb.put(1.toByte).put(shape.size.toByte).put(0.toByte)
      bb.put(0.toByte); bb.putInt(0)
      shape.foreach(d => bb.putLong(d.toLong))
    }, 8 + shape.size * 8)
    val scalarDs: Array[Byte] = dataspaceMsg(Nil)
    val f32Dt: Array[Byte] = bodyBuf({ bb =>
      bb.put(0x11.toByte).put(0x20.toByte).put(0x1f.toByte).put(0.toByte).putInt(4)
      bb.putShort(0).putShort(32).put(23.toByte).put(8.toByte).put(0.toByte).put(23.toByte).putInt(127)
    }, 20)
    // IEEE double (sign 63, exp 52×11 bias 1023, mantissa 0×52) — the
    // type netcdf-c stores scale_factor/add_offset attributes in
    val f64Dt: Array[Byte] = bodyBuf({ bb =>
      bb.put(0x11.toByte).put(0x20.toByte).put(0x3f.toByte).put(0.toByte).putInt(8)
      bb.putShort(0).putShort(64).put(52.toByte).put(11.toByte).put(0.toByte).put(52.toByte).putInt(1023)
    }, 24)
    def strDt(len: Int): Array[Byte] = bodyBuf({ bb =>
      bb.put(0x13.toByte).put(0.toByte).put(0.toByte).put(0.toByte).putInt(len)
    }, 8)
    val vlenRefDt: Array[Byte] = bodyBuf({ bb =>
      bb.put(0x19.toByte).put(0.toByte).put(0.toByte).put(0.toByte).putInt(16)
      bb.put(0x17.toByte).put(0.toByte).put(0.toByte).put(0.toByte).putInt(8)
    }, 16)
    def attrMsg(name: String, dt: Array[Byte], ds: Array[Byte], data: Array[Byte]): Array[Byte] = {
      val nb = name.getBytes("UTF-8") :+ 0.toByte
      val head = bodyBuf({ bb =>
        bb.put(1.toByte).put(0.toByte)
        bb.putShort(nb.length.toShort).putShort(dt.length.toShort).putShort(ds.length.toShort)
      }, 8)
      head ++ pad8(nb) ++ pad8(dt) ++ pad8(ds) ++ data
    }
    def strAttr(name: String, value: String): Array[Byte] = {
      val vb = value.getBytes("UTF-8") :+ 0.toByte
      attrMsg(name, strDt(vb.length), scalarDs, vb)
    }
    val i32Dt: Array[Byte] = bodyBuf({ bb =>
      bb.put(0x10.toByte).put(0x08.toByte).put(0.toByte).put(0.toByte).putInt(4)
      bb.putShort(0).putShort(32)
    }, 12)
    def intAttr(name: String, value: Int): Array[Byte] =
      attrMsg(name, i32Dt, scalarDs, bodyBuf(bb => { bb.putInt(value); () }, 4))
    def objectHeader(msgs: Seq[(Int, Array[Byte])]): Array[Byte] = {
      val padded = msgs.map { case (t, b) => (t, pad8(b)) }
      val total = padded.map(_._2.length + 8).sum
      val bb = ByteBuffer.allocate(16 + total).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(1.toByte).put(0.toByte).putShort(msgs.size.toShort)
      bb.putInt(1).putInt(total).putInt(0)
      padded.foreach { case (t, b) =>
        bb.putShort(t.toShort).putShort(b.length.toShort)
        bb.put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
        bb.put(b)
      }
      bb.array()
    }

    // ---- plan ----
    val varByName = variables.map(v => v.name -> v).toMap
    val dimSets = dims.map { case (n, sz) => (n, sz, varByName.get(n)) }
    val dataVars = variables.filterNot(v => dims.exists(_._1 == v.name))
    // root links: dims + either the data vars or the one child group;
    // the ONE local heap serves both groups' symbol tables (name
    // offsets are heap-relative, and both STABs point at it)
    // virtual-stack sources are real root-linked datasets of their own
    val vdsSrcNames: Seq[String] =
      if (!virtualStack || virtualCrossFiles.nonEmpty || virtualPrintf.nonEmpty) Nil // cross-file: sources live elsewhere
      else dataVars.filter(_.ncType != 2).flatMap { v =>
        val nT = dims.find(_._1 == v.dims.head).get._2
        (0 until nT).map(k => s"${v.name}_src$k")
      }
    val allNames = dimSets.map(_._1) ++
      subgroup.map(Seq(_)).getOrElse(dataVars.map(_.name)) ++ vdsSrcNames ++
      (if (opaqueExtra) Seq("runtime_meta") else Nil) ++
      (if (bitfieldExtra) Seq("flags") else Nil) ++
      (if (timeExtra) Seq("stamps") else Nil)
    val heapNames = (allNames ++
      (if (subgroup.isDefined) dataVars.map(_.name) else Nil) ++
      (if (denseRoot) Nil
       else softLinks.flatMap { case (n, t) => Seq(n, t) })).distinct

    out.write(new Array[Byte](96)) // superblock placeholder, patched below

    // local heap with the root group's link names
    val nameBytes = heapNames.map(n => n.getBytes("UTF-8") :+ 0.toByte)
    val nameOffs = scala.collection.mutable.Map[String, Long]()
    val heapAddr = pos
    val dataSz = nameBytes.map(b => ((b.length + 7) / 8) * 8).sum
    raw("HEAP".getBytes); u8(0); u8(0); u8(0); u8(0)
    u64(dataSz); u64(Undef); u64(heapAddr + 32)
    heapNames.zip(nameBytes).foreach { case (n, b) =>
      nameOffs(n) = pos - (heapAddr + 32); raw(pad8(b))
    }

    // dimension-scale datasets: contiguous data then object header
    val ohAddrs = scala.collection.mutable.Map[String, Long]()
    dimSets.zipWithIndex.foreach { case ((name, sz, coord), dimId) =>
      val data = coord.map(_.data).getOrElse(new Array[Float](sz))
      val dataAddr = pos
      data.foreach(f => u32(java.lang.Float.floatToIntBits(f).toLong & 0xffffffffL))
      padTo8()
      val msgs = Seq(
        0x01 -> dataspaceMsg(Seq(sz)),
        0x03 -> f32Dt,
        0x05 -> bodyBuf(bb => { bb.put(2.toByte).put(1.toByte).put(0.toByte).put(0.toByte) }, 4),
        0x08 -> bodyBuf({ bb =>
          bb.put(3.toByte).put(1.toByte); bb.putLong(dataAddr.toLong); bb.putLong(sz * 4L)
        }, 18),
        0x0C -> strAttr("CLASS", "DIMENSION_SCALE"),
        0x0C -> intAttr("_Netcdf4Dimid", dimId)) ++
        (if (coord.isEmpty) Seq(0x0C -> strAttr("NAME",
          s"This is a netCDF dimension but not a netCDF variable. $sz")) else Nil)
      ohAddrs(name) = pos
      raw(objectHeader(msgs))
      padTo8()
    }

    // global heap carrying every data variable's DIMENSION_LIST refs
    val gheapAddr = pos
    val nRefs = dataVars.map(_.dims.size).sum
    val gheapIdx = scala.collection.mutable.Map[(String, Int), Int]()
    raw("GCOL".getBytes); u8(1); u8(0); u8(0); u8(0)
    u64(16 + 24L * nRefs)
    var gi = 1
    dataVars.foreach { v =>
      v.dims.zipWithIndex.foreach { case (dn, di) =>
        gheapIdx((v.name, di)) = gi
        u16(gi); u16(1); u32(0); u64(8); u64(ohAddrs(dn))
        gi += 1
      }
    }

    // data variables: deflated chunks + chunk btree + object header
    dataVars.foreach { v =>
      if (v.ncType == 2) {
        // ---- char variable. Default: the netcdf-c NC_CHAR shape — a
        // FIXED string of size 1 with the string-length axis as a real
        // dimension, contiguous storage. With `vlenStr`: the
        // NC_STRING/h5py shape — vlen strings through a global heap,
        // the width folded out of the dataspace.
        val cshape = v.dims.map(d => dims.find(_._1 == d).get._2).toArray
        if (!vlenStr) {
          val dataAddr = pos
          v.data.foreach(f => u8(f.toInt & 0xff))
          padTo8()
          val charDt = bodyBuf({ bb =>
            bb.put(0x13.toByte).put(0.toByte).put(0.toByte).put(0.toByte); bb.putInt(1)
          }, 8)
          val dimListData = bodyBuf({ bb =>
            v.dims.indices.foreach { di =>
              bb.putInt(1); bb.putLong(gheapAddr.toLong); bb.putInt(gheapIdx((v.name, di)))
            }
          }, v.dims.size * 16)
          val msgs = Seq(
            0x01 -> dataspaceMsg(cshape.toSeq),
            0x03 -> charDt,
            0x05 -> bodyBuf(bb => { bb.put(2.toByte).put(1.toByte).put(0.toByte).put(0.toByte) }, 4),
            0x08 -> bodyBuf({ bb =>
              bb.put(3.toByte).put(1.toByte); bb.putLong(dataAddr.toLong)
              bb.putLong(v.data.length.toLong)
            }, 18),
            0x0C -> attrMsg("DIMENSION_LIST", vlenRefDt,
              dataspaceMsg(Seq(v.dims.size)), dimListData))
          ohAddrs(v.name) = pos
          raw(objectHeader(msgs))
          padTo8()
        } else {
          val width = cshape.last
          val outer = cshape.dropRight(1)
          val nEl = outer.product.max(1)
          val strsB: Seq[Array[Byte]] = (0 until nEl).map { i =>
            val cs = v.data.slice(i * width, (i + 1) * width).map(f => (f.toInt & 0xff).toByte)
            var e2 = cs.length
            while (e2 > 0 && (cs(e2 - 1) == 0 || cs(e2 - 1) == ' '.toByte)) e2 -= 1
            java.util.Arrays.copyOfRange(cs, 0, e2)
          }
          val strHeapAddr = pos
          val heapSz = 16 + strsB.map(s => 16 + ((s.length + 7) / 8) * 8).sum
          raw("GCOL".getBytes); u8(1); u8(0); u8(0); u8(0)
          u64(heapSz.toLong)
          strsB.zipWithIndex.foreach { case (s, i) =>
            u16(i + 1); u16(1); u32(0); u64(s.length.toLong); raw(pad8(s))
          }
          padTo8()
          val dataAddr = pos
          strsB.zipWithIndex.foreach { case (s, i) =>
            u32(s.length.toLong); u64(strHeapAddr.toLong); u32((i + 1).toLong)
          }
          padTo8()
          val vlenStrDt = bodyBuf({ bb =>
            bb.put(0x19.toByte).put(1.toByte).put(0.toByte).put(0.toByte); bb.putInt(16)
            bb.put(0x13.toByte).put(0.toByte).put(0.toByte).put(0.toByte); bb.putInt(1)
          }, 16)
          val dimListData = bodyBuf({ bb =>
            outer.indices.foreach { di =>
              bb.putInt(1); bb.putLong(gheapAddr.toLong); bb.putInt(gheapIdx((v.name, di)))
            }
          }, outer.length * 16)
          val msgs = Seq(
            0x01 -> dataspaceMsg(outer.toSeq),
            0x03 -> vlenStrDt,
            0x05 -> bodyBuf(bb => { bb.put(2.toByte).put(1.toByte).put(0.toByte).put(0.toByte) }, 4),
            0x08 -> bodyBuf({ bb =>
              bb.put(3.toByte).put(1.toByte); bb.putLong(dataAddr.toLong)
              bb.putLong(nEl * 16L)
            }, 18),
            0x0C -> attrMsg("DIMENSION_LIST", vlenRefDt,
              dataspaceMsg(Seq(outer.length)), dimListData))
          ohAddrs(v.name) = pos
          raw(objectHeader(msgs))
          padTo8()
        }
      } else if (compoundVars.contains(v.name)) {
        // ---- contiguous compound dataset (v1 compound datatype
        // message, padded member names, 4-byte offsets; a member type
        // "f32x3" is an ARRAY member — v1 dimensionality 1, the
        // HDF-EOS per-row coordinate-triple shape)
        val members = compoundVars(v.name)
        val shape = v.dims.map(d => dims.find(_._1 == d).get._2).toArray
        val nEl = shape.product
        def parseM(t: String): (String, Int) = t.split("x") match {
          case Array(b) => (b, 1)
          case Array(b, c) => (b, c.toInt)
        }
        def mSize(t: String): Int = parseM(t)._1 match {
          case "i16" => 2; case "i32" => 4; case "f32" => 4; case "f64" => 8
          case o => throw new IllegalArgumentException(s"compound member type $o")
        }
        val counts = members.map(m => parseM(m._2)._2)
        val offs = members.zip(counts).map { case (m, c) => mSize(m._2) * c }
          .scanLeft(0)(_ + _)
        val elemSize = offs.last
        val valOffs = counts.scanLeft(0)(_ + _)
        val valsPerEl = valOffs.last
        require(v.data.length == nEl * valsPerEl,
          s"compound fixture '${v.name}': ${v.data.length} values for " +
            s"$nEl elements x $valsPerEl member values")
        val dataAddr = pos
        val dbuf = ByteBuffer.allocate(nEl * elemSize).order(ByteOrder.LITTLE_ENDIAN)
        for (i <- 0 until nEl; (m, j) <- members.zipWithIndex; c <- 0 until counts(j)) {
          val value = v.data(i * valsPerEl + valOffs(j) + c)
          parseM(m._2)._1 match {
            case "i16" =>
              require(value.toShort.toFloat == value, s"compound i16 sample $value")
              dbuf.putShort(value.toShort)
            case "i32" =>
              require(value.toInt.toFloat == value, s"compound i32 sample $value")
              dbuf.putInt(value.toInt)
            case "f32" => dbuf.putFloat(value)
            case _ => dbuf.putDouble(value.toDouble)
          }
        }
        raw(dbuf.array())
        padTo8()
        def memberDt(t: String): Array[Byte] = parseM(t)._1 match {
          case "i16" | "i32" => bodyBuf({ bb =>
            bb.put(0x10.toByte).put(0x08.toByte).put(0.toByte).put(0.toByte)
            bb.putInt(mSize(t))
            bb.putShort(0).putShort((8 * mSize(t)).toShort)
          }, 12)
          case "f32" => f32Dt
          case _ => f64Dt
        }
        val cmpDt = {
          val b = new java.io.ByteArrayOutputStream()
          val head = bodyBuf({ bb =>
            bb.put(0x16.toByte) // version 1, class 6
            bb.put((members.size & 0xff).toByte)
              .put(((members.size >> 8) & 0xff).toByte)
              .put(0.toByte) // bit-field byte 3
            bb.putInt(elemSize)
          }, 8)
          b.write(head)
          members.zipWithIndex.foreach { case ((mn, t), j) =>
            b.write(pad8(mn.getBytes("UTF-8") :+ 0.toByte))
            b.write(bodyBuf({ bb =>
              bb.putInt(offs(j))
              bb.put((if (counts(j) > 1) 1 else 0).toByte) // dimensionality
              bb.put(0.toByte).put(0.toByte).put(0.toByte) // reserved
              bb.putInt(0) // permutation
              bb.putInt(0) // reserved
              bb.putInt(if (counts(j) > 1) counts(j) else 0) // dim size 1
              (0 until 3).foreach(_ => bb.putInt(0)) // dim sizes 2-4
            }, 32))
            b.write(memberDt(t))
          }
          b.toByteArray
        }
        val dimListData = bodyBuf({ bb =>
          v.dims.indices.foreach { di =>
            bb.putInt(1); bb.putLong(gheapAddr.toLong); bb.putInt(gheapIdx((v.name, di)))
          }
        }, v.dims.size * 16)
        val msgs = Seq(
          0x01 -> dataspaceMsg(shape.toSeq),
          0x03 -> cmpDt,
          0x05 -> bodyBuf(bb => { bb.put(2.toByte).put(1.toByte).put(0.toByte).put(0.toByte) }, 4),
          0x08 -> bodyBuf({ bb =>
            bb.put(3.toByte).put(1.toByte); bb.putLong(dataAddr.toLong)
            bb.putLong(nEl.toLong * elemSize)
          }, 18),
          0x0C -> attrMsg("DIMENSION_LIST", vlenRefDt,
            dataspaceMsg(Seq(v.dims.size)), dimListData))
        ohAddrs(v.name) = pos
        raw(objectHeader(msgs))
        padTo8()
      } else if (virtualStack) {
        // ---- virtual dataset (VDS, layout class 3): the classic
        // stacking shape — one real 2-D source dataset per leading
        // index, the named variable a VIRTUAL map assembling them
        // (same-file sources '.'; libhdf5 writes the identical layout
        // for h5py virtual_sources). Checksums in the mapping blob are
        // written zero like the dense-root fixtures — the reader
        // consults neither.
        val shape = v.dims.map(d => dims.find(_._1 == d).get._2).toArray
        require(shape.length >= 2, "virtualStack needs rank >= 2 variables")
        val nT = shape.head
        val slice = shape.drop(1).product
        require(virtualCrossFiles.isEmpty || virtualCrossFiles.length == nT,
          s"virtualCrossFiles: need one (file, path) per leading index ($nT)")
        // real contiguous sources, one per leading index (same-file
        // stacks only — cross-file stacks keep sources in sibling files)
        for (k <- 0 until nT if virtualCrossFiles.isEmpty && virtualPrintf.isEmpty) {
          val dataAddr = pos
          for (i <- 0 until slice)
            u32(java.lang.Float.floatToIntBits(v.data(k * slice + i)).toLong & 0xffffffffL)
          padTo8()
          val msgs = Seq(
            0x01 -> dataspaceMsg(shape.drop(1).toSeq),
            0x03 -> f32Dt,
            0x05 -> bodyBuf(bb => { bb.put(2.toByte).put(1.toByte).put(0.toByte).put(0.toByte) }, 4),
            0x08 -> bodyBuf({ bb =>
              bb.put(3.toByte).put(1.toByte)
              bb.putLong(dataAddr.toLong); bb.putLong(slice * 4L)
            }, 18))
          ohAddrs(s"${v.name}_src$k") = pos
          raw(objectHeader(msgs))
          padTo8()
        }
        // the VDS mapping blob in its own global heap collection:
        // version 0, entry count, then per mapping (file, dataset,
        // source selection = ALL, virtual selection = one hyperslab-v1
        // block pinning the leading index), checksum (zeroed)
        val blobB = new java.io.ByteArrayOutputStream()
        val blb = new java.io.DataOutputStream(blobB)
        def bu32le(v0: Long): Unit = {
          blb.write(v0.toInt & 0xff); blb.write((v0 >> 8).toInt & 0xff)
          blb.write((v0 >> 16).toInt & 0xff); blb.write((v0 >> 24).toInt & 0xff)
        }
        blb.write(0) // version
        if (virtualPrintf.isDefined) {
          val rank = shape.length
          bu32le(1); bu32le(0) // entry count (u64 LE): ONE printf mapping
          blb.write(virtualPrintf.get.getBytes("UTF-8")); blb.write(0)
          blb.write(s"/${v.name}".getBytes("UTF-8")); blb.write(0)
          // source selection: H5S_SEL_ALL v1 + 8 reserved
          bu32le(3); bu32le(1); bu32le(0); bu32le(0)
          // virtual selection: REGULAR hyperslab v2 with H5S_UNLIMITED
          // count along the leading dim — block b = member file b
          def bu64le(v0: Long): Unit = { bu32le(v0 & 0xffffffffL); bu32le(v0 >>> 32) }
          bu32le(2); bu32le(2) // type, version
          blb.write(0) // flags
          bu32le(4L + rank * 32L) // encoded length
          bu32le(rank)
          // dim 0: start 0, stride 1, count UNLIMITED, block 1
          bu64le(0); bu64le(1); bu64le(-1L); bu64le(1)
          for (d <- 1 until rank) { // bounded dims: one full-extent block
            bu64le(0); bu64le(1); bu64le(1); bu64le(shape(d))
          }
        } else {
        bu32le(nT); bu32le(0) // entry count (u64 LE)
        for (k <- 0 until nT) {
          val (sf, sp) =
            if (virtualCrossFiles.isEmpty) (".", s"/${v.name}_src$k")
            else virtualCrossFiles(k)
          blb.write(sf.getBytes("UTF-8")); blb.write(0)
          blb.write(sp.getBytes("UTF-8")); blb.write(0)
          // source selection: H5S_SEL_ALL v1 + 8 reserved
          bu32le(3); bu32le(1); bu32le(0); bu32le(0)
          // virtual selection: hyperslab v1, one block
          val rank = shape.length
          bu32le(2); bu32le(1); bu32le(0) // type, version, reserved
          bu32le(8L + 2L * rank * 4) // encoded length (rank+nblocks+coords)
          bu32le(rank); bu32le(1)
          bu32le(k); for (_ <- 1 until rank) bu32le(0) // start
          bu32le(k); for (d <- 1 until rank) bu32le(shape(d) - 1L) // end, inclusive
        }
        }
        bu32le(0) // checksum (unchecked)
        val blob = blobB.toByteArray
        val vdsGcol = pos
        raw("GCOL".getBytes); u8(1); u8(0); u8(0); u8(0)
        u64(16 + 16 + ((blob.length + 7) / 8) * 8)
        u16(1); u16(1); u32(0); u64(blob.length)
        raw(pad8(blob))
        // the virtual dataset itself
        val dimListData = bodyBuf({ bb =>
          v.dims.indices.foreach { di =>
            bb.putInt(1); bb.putLong(gheapAddr.toLong); bb.putInt(gheapIdx((v.name, di)))
          }
        }, v.dims.size * 16)
        val msgs = Seq(
          // printf form: declared extent 0 along the unlimited dim —
          // the reader must enumerate members for the true extent
          0x01 -> dataspaceMsg(
            if (virtualPrintf.isDefined) 0 +: shape.toSeq.tail else shape.toSeq),
          0x03 -> f32Dt,
          0x05 -> bodyBuf({ bb =>
            bb.put(2.toByte).put(1.toByte).put(0.toByte)
            v.fill match {
              case Some(f) => bb.put(1.toByte).putInt(4).putFloat(f)
              case None => bb.put(0.toByte)
            }
          }, 12),
          0x08 -> bodyBuf({ bb =>
            bb.put(4.toByte).put(3.toByte) // layout v4, class 3 virtual
            bb.putLong(vdsGcol.toLong); bb.putInt(1)
          }, 14),
          0x0C -> attrMsg("DIMENSION_LIST", vlenRefDt,
            dataspaceMsg(Seq(v.dims.size)), dimListData)) ++
          v.fill.map(f => 0x0C -> attrMsg("_FillValue", f32Dt,
            scalarDs, bodyBuf(bb => { bb.putFloat(f); () }, 4))).toSeq
        ohAddrs(v.name) = pos
        raw(objectHeader(msgs))
        padTo8()
      } else {
      val shape = v.dims.map(d => dims.find(_._1 == d).get._2).toArray
      val rank = shape.length
      val enumOf = enumVars.get(v.name)
      require(enumOf.isEmpty || (layoutV4.isEmpty && !szip),
        "fixture writer: enum variables use the v3 chunked layout")
      val int16Packed = nbitPrecision.isDefined || scaleOffsetInt
      val elemB = if (szip || int16Packed) 2 else if (enumOf.isDefined) 1 else 4
      // one leading-index slice per chunk; split the next axis to force
      // a partial edge chunk when it doesn't divide evenly
      val chunkDims = shape.zipWithIndex.map { case (d, i) =>
        if (rank >= 2 && i == 0) 1
        else if (rank >= 2 && i == 1 && d > 2) d - 1
        else d
      }
      val strides = new Array[Int](rank)
      var s = 1
      for (i <- (rank - 1) to 0 by -1) { strides(i) = s; s *= shape(i) }
      val grid = shape.zip(chunkDims).map { case (d, c) => (d + c - 1) / c }
      val nChunks = grid.product
      val cTotal = chunkDims.product
      // client data for the packed-bit filters (H5Packed): element
      // count is per-CHUNK (chunks are stored full-size, edges padded)
      val packedCd: Option[Array[Int]] =
        if (nbitPrecision.isDefined)
          // [valid-count, compress flag, nelmts, ATOMIC, size, LE, precision, offset]
          Some(Array(8, 1, cTotal, 1, 2, 0, nbitPrecision.get, 0))
        else if (scaleOffsetInt)
          // [SO_INT, factor, nelmts, int class, size, signed, LE, filavail(, filval)]
          Some(Array(2, 0, cTotal, 0, 2, 1, 0) ++
            (v.fill match {
              case Some(f) => Array(1, f.toInt & 0xffff)
              case None => Array(0)
            }))
        else scaleOffsetDScale.map(sf =>
          // [DSCALE, factor, nelmts, float class, size, unsigned, LE, filavail(, filval)]
          Array(0, sf, cTotal, 1, 4, 0, 0) ++
            (v.fill match {
              case Some(f) => Array(1, java.lang.Float.floatToIntBits(f))
              case None => Array(0)
            }))
      val chunkEntries = scala.collection.mutable.Buffer[(Array[Int], Long, Int)]()
      for (ci <- 0 until nChunks) {
        var rem = ci
        val cc = new Array[Int](rank)
        for (d <- (rank - 1) to 0 by -1) { cc(d) = (rem % grid(d)) * chunkDims(d); rem /= grid(d) }
        val cbuf = ByteBuffer.allocate(cTotal * elemB)
          .order(ByteOrder.LITTLE_ENDIAN)
        for (ei <- 0 until cTotal) {
          var er = ei
          var src = 0
          var ok = true
          for (d <- (rank - 1) to 0 by -1) {
            val coord = cc(d) + er % chunkDims(d); er /= chunkDims(d)
            if (coord >= shape(d)) ok = false else src += coord * strides(d)
          }
          val value = if (ok) v.data(src) else v.fill.getOrElse(0f)
          if (szip) {
            val sv = value.toInt
            require(sv >= 0 && sv <= 0x7fff && sv.toFloat == value,
              s"szip fixture sample $value not a non-negative 15-bit integer")
            cbuf.putShort(sv.toShort)
          } else if (int16Packed) {
            val sv = value.toInt
            require(sv >= Short.MinValue && sv <= Short.MaxValue && sv.toFloat == value,
              s"packed-filter fixture sample $value not a 16-bit integer")
            nbitPrecision.foreach(pr => require(
              sv >= -(1 << (pr - 1)) && sv < (1 << (pr - 1)),
              s"nbit fixture sample $sv outside signed $pr-bit range"))
            cbuf.putShort(sv.toShort)
          } else if (enumOf.isDefined) {
            val code = value.toInt
            require(code >= 0 && code < enumOf.get.size && code.toFloat == value,
              s"enum fixture sample $value is not a member code")
            cbuf.put(code.toByte)
          } else cbuf.putFloat(value)
        }
        var payload = cbuf.array()
        val storeFiltered = layoutV4 != Some(2) && !v4Unfiltered
        if (storeFiltered && szip) {
          payload = Szip.encode(payload, SzipFixtureCd, 2)
        } else if (storeFiltered && szip32) {
          payload = Szip.encode(payload, Szip32FixtureCd, 4)
        } else if (storeFiltered && packedCd.isDefined) {
          payload =
            if (nbitPrecision.isDefined) H5Packed.nbitEncode(payload, packedCd.get)
            else H5Packed.scaleoffsetEncode(payload, packedCd.get)
        } else if (storeFiltered) {
          if (shuffle) {
            val nEl = payload.length / 4
            val sh = new Array[Byte](payload.length)
            for (b <- 0 until 4; i <- 0 until nEl) sh(b * nEl + i) = payload(i * 4 + b)
            payload = sh
          }
          if (fletcher) {
            // netcdf-c pipeline order (shuffle, fletcher32, deflate):
            // the checksum covers the post-shuffle bytes, appended LE
            val ck = fletcher32(payload, payload.length)
            val withCk = java.util.Arrays.copyOf(payload, payload.length + 4)
            withCk(payload.length) = ck.toByte
            withCk(payload.length + 1) = (ck >> 8).toByte
            withCk(payload.length + 2) = (ck >> 16).toByte
            withCk(payload.length + 3) = (ck >> 24).toByte
            payload = withCk
          }
          val defl = new java.util.zip.Deflater()
          defl.setInput(payload); defl.finish()
          val cbytes = new Array[Byte](payload.length + 64)
          val nz = defl.deflate(cbytes)
          defl.end()
          payload = java.util.Arrays.copyOf(cbytes, nz)
        }
        val addr = pos
        raw(payload)
        // implicit chunks must be back-to-back at their nominal size
        if (layoutV4 != Some(2)) padTo8()
        chunkEntries += ((cc, addr.toLong, payload.length))
      }
      val storeFiltered = layoutV4 != Some(2) && !v4Unfiltered
      val layoutMsg: Array[Byte] = layoutV4 match {
        case None =>
          val btreeAddr = pos
          raw("TREE".getBytes); u8(1); u8(0); u16(chunkEntries.size)
          u64(Undef); u64(Undef)
          chunkEntries.foreach { case (cc, addr, nz) =>
            u32(nz.toLong); u32(0)
            cc.foreach(c => u64(c.toLong)); u64(0)
            u64(addr)
          }
          u32(0); u32(0); shape.foreach(d => u64(d.toLong)); u64(0) // final key
          padTo8()
          bodyBuf({ bb =>
            bb.put(3.toByte).put(2.toByte).put((rank + 1).toByte)
            bb.putLong(btreeAddr.toLong)
            chunkDims.foreach(bb.putInt); bb.putInt(elemB)
          }, 11 + (rank + 1) * 4)
        case Some(idxType) =>
          val clientId = if (storeFiltered) 1 else 0
          val elmtSize = if (storeFiltered) 16 else 8 // addr + size(4) + mask(4) | addr
          def element(bb: ByteBuffer, e: Option[(Long, Int)]): Unit = e match {
            case Some((addr, nz)) =>
              bb.putLong(addr)
              if (storeFiltered) { bb.putInt(nz); bb.putInt(0) }
            case None =>
              bb.putLong(Undef)
              if (storeFiltered) { bb.putInt(0); bb.putInt(0) }
          }
          val idxAddr: Long = idxType match {
            case 1 => // single chunk: the address IS the chunk
              require(chunkEntries.size == 1, "single-chunk index needs one chunk")
              chunkEntries.head._2
            case 2 => // implicit: base address of the back-to-back chunks
              padTo8()
              chunkEntries.head._2
            case 3 => // fixed array: FAHD + FADB (paged when count > page)
              val pageN = 1L << v4PageBits
              val n = chunkEntries.size
              val dbAddr = pos.toLong
              raw("FADB".getBytes); u8(0); u8(clientId); u64(Undef) // hdr addr patched never read
              if (n > pageN) {
                val nPages = ((n + pageN - 1) / pageN).toInt
                for (_ <- 0 until (nPages + 7) / 8) u8(0xff) // all pages initialized
                u32(0) // PREFIX checksum (H5FA: prefix ends before page 0)
                var ci = 0
                for (pg <- 0 until nPages) {
                  val inPage = math.min(pageN, n - pg.toLong * pageN).toInt
                  raw(bodyBuf({ bb =>
                    for (_ <- 0 until inPage) {
                      element(bb, Some((chunkEntries(ci)._2, chunkEntries(ci)._3))); ci += 1
                    }
                  }, inPage * elmtSize))
                  u32(0) // page checksum (reader skips)
                }
              } else {
                raw(bodyBuf({ bb =>
                  chunkEntries.foreach(e => element(bb, Some((e._2, e._3))))
                }, n * elmtSize))
                u32(0) // data block checksum
              }
              padTo8()
              val hdr = pos.toLong
              raw("FAHD".getBytes); u8(0); u8(clientId); u8(elmtSize); u8(v4PageBits)
              u64(n.toLong); u64(dbAddr); u32(0)
              padTo8()
              hdr
            case 4 => // extensible array: EAHD + EAIB + EADBs + EASBs
              val idxBlkElmts = 2; val dblkMinElmts = 2; val maxNelmtsBits = 16
              val blkOffW = (maxNelmtsBits + 7) / 8
              val n = chunkEntries.size
              val nsblks = 1 + maxNelmtsBits - 1 // log2(dblkMinElmts=2) = 1
              def dblkCap(u: Int) = dblkMinElmts << ((u + 1) / 2)
              val eaPageN = 1 << eaPageBits
              var next = idxBlkElmts
              def writeDblk(cap: Int): Long =
                if (next >= n) { next += cap; Undef }
                else {
                  val a0 = pos.toLong
                  raw("EADB".getBytes); u8(0); u8(clientId); u64(Undef)
                  for (_ <- 0 until blkOffW) u8(0)
                  def elems(from: Int, count: Int): Unit =
                    raw(bodyBuf({ bb =>
                      for (i <- 0 until count)
                        element(bb, if (from + i < n)
                          Some((chunkEntries(from + i)._2, chunkEntries(from + i)._3)) else None)
                    }, count * elmtSize))
                  if (cap <= eaPageN) { elems(next, cap); u32(0) }
                  else { // paged: prefix checksum, then pages + checksum each
                    u32(0) // PREFIX checksum (H5EA: prefix ends before page 0)
                    var done = 0
                    while (done < cap) {
                      val inPage = math.min(eaPageN, cap - done)
                      elems(next + done, inPage)
                      u32(0) // page checksum (reader skips)
                      done += inPage
                    }
                  }
                  padTo8()
                  next += cap
                  a0
                }
              // super blocks 0/1: one data block each, addressed from
              // the index block directly
              val directAddrs = (0 to 1).map(u => writeDblk(dblkCap(u)))
              // super blocks 2+: 2^(u/2) data blocks behind an EASB
              val sblkAddrs = scala.collection.mutable.Buffer[Long]()
              var su = 2
              while (su < nsblks && next < n) {
                val dAddrs = (0 until (1 << (su / 2))).map(_ => writeDblk(dblkCap(su)))
                if (dAddrs.forall(_ == Undef)) sblkAddrs += Undef
                else {
                  val sA = pos.toLong
                  raw("EASB".getBytes); u8(0); u8(clientId); u64(Undef)
                  for (_ <- 0 until blkOffW) u8(0)
                  if (dblkCap(su) > eaPageN) {
                    val npg = (dblkCap(su) + eaPageN - 1) / eaPageN
                    for (_ <- 0 until ((dAddrs.size.toLong * npg + 7) / 8).toInt)
                      u8(0xff) // page-init bitmap: all pages written
                  }
                  dAddrs.foreach(u64)
                  u32(0)
                  padTo8()
                  sblkAddrs += sA
                }
                su += 1
              }
              while (sblkAddrs.size < nsblks - 2) sblkAddrs += Undef
              require(next >= n, s"fixture writer: $n chunks exceed EA capacity")
              val ibAddr = pos.toLong
              raw("EAIB".getBytes); u8(0); u8(clientId); u64(Undef)
              raw(bodyBuf({ bb =>
                for (i <- 0 until idxBlkElmts)
                  element(bb, if (i < n) Some((chunkEntries(i)._2, chunkEntries(i)._3)) else None)
              }, idxBlkElmts * elmtSize))
              directAddrs.foreach(u64)
              sblkAddrs.foreach(u64)
              u32(0)
              padTo8()
              val hdr = pos.toLong
              raw("EAHD".getBytes); u8(0); u8(clientId); u8(elmtSize)
              u8(maxNelmtsBits); u8(idxBlkElmts); u8(dblkMinElmts); u8(2); u8(eaPageBits)
              u64(0); u64(0); u64(2); u64(0); u64(n.toLong); u64(n.toLong)
              u64(ibAddr); u32(0)
              padTo8()
              hdr
            case 5 => // v2 B-tree, depth 0: BTHD + one BTLF of records
              val recSize = if (storeFiltered) 8 + 4 + 4 + 8 * rank else 8 + 8 * rank
              val leafAddr = pos.toLong
              raw("BTLF".getBytes); u8(0); u8(if (storeFiltered) 11 else 10)
              raw(bodyBuf({ bb =>
                chunkEntries.foreach { case (cc, addr, nz) =>
                  bb.putLong(addr)
                  if (storeFiltered) { bb.putInt(nz); bb.putInt(0) }
                  cc.indices.foreach(d => bb.putLong((cc(d) / chunkDims(d)).toLong))
                }
              }, chunkEntries.size * recSize))
              u32(0)
              padTo8()
              val hdr = pos.toLong
              raw("BTHD".getBytes); u8(0); u8(if (storeFiltered) 11 else 10)
              u32(2048); u16(recSize); u16(0) // node size, record size, depth 0
              u8(100); u8(40) // split/merge percent
              u64(leafAddr); u16(chunkEntries.size); u64(chunkEntries.size.toLong)
              u32(0)
              padTo8()
              hdr
            case t => throw new IllegalArgumentException(s"fixture writer: v4 index $t")
          }
          bodyBuf({ bb =>
            bb.put(4.toByte).put(2.toByte) // version 4, chunked
            val singleFiltered = idxType == 1 && storeFiltered
            bb.put((if (singleFiltered) 2 else 0).toByte) // flags
            bb.put((rank + 1).toByte).put(4.toByte) // ndims (incl elem), 4-byte dims
            chunkDims.foreach(bb.putInt); bb.putInt(4)
            bb.put(idxType.toByte)
            idxType match {
              case 1 if singleFiltered =>
                bb.putLong(chunkEntries.head._3.toLong); bb.putInt(0)
              case 3 => bb.put(v4PageBits.toByte)
              case 4 => // max bits, idx elmts, min ptrs, min elmts, page bits
                bb.put(16.toByte).put(2.toByte).put(2.toByte).put(2.toByte)
                  .put(eaPageBits.toByte)
              case 5 => bb.putInt(2048); bb.put(100.toByte).put(40.toByte)
              case _ =>
            }
            bb.putLong(idxAddr)
          }, 32 + (rank + 1) * 4 + 16)
      }

      val dimListData = bodyBuf({ bb =>
        v.dims.indices.foreach { di =>
          bb.putInt(1); bb.putLong(gheapAddr.toLong); bb.putInt(gheapIdx((v.name, di)))
        }
      }, v.dims.size * 16)
      val filterIds =
        if (szip) Seq((4, SzipFixtureCd.toSeq))
        else if (szip32) Seq((4, Szip32FixtureCd.toSeq))
        else if (packedCd.isDefined)
          Seq(((if (nbitPrecision.isDefined) 5 else 6), packedCd.get.toSeq))
        else (if (shuffle) Seq((2, Seq(4))) else Nil) ++
          (if (fletcher) Seq((3, Seq.empty[Int])) else Nil) :+ ((1, Seq(6)))
      // int16, with the bit precision the n-bit filter packs to (full
      // 16 for the unpacked fixtures)
      def i16Dt(precision: Int): Array[Byte] = bodyBuf({ bb =>
        bb.put(0x10.toByte).put(0x08.toByte).put(0.toByte).put(0.toByte).putInt(2)
        bb.putShort(0).putShort(precision.toShort)
      }, 12)
      val i16DtMsg: Array[Byte] = i16Dt(16)
      // enum-of-uint8 datatype: v1 class-8 header (member count in the
      // class bit field), the base int message, 8-padded NUL-terminated
      // member names, then the member values (codes = label indexes)
      def enumDtMsg(labels: Seq[String]): Array[Byte] = {
        val head = bodyBuf({ bb =>
          bb.put(0x18.toByte) // version 1, class 8
          bb.put((labels.size & 0xff).toByte)
            .put(((labels.size >> 8) & 0xff).toByte).put(0.toByte)
          bb.putInt(1) // enum size = base size
        }, 8)
        val base = bodyBuf({ bb =>
          bb.put(0x10.toByte).put(0.toByte).put(0.toByte).put(0.toByte).putInt(1)
          bb.putShort(0).putShort(8)
        }, 12)
        val names = labels.toArray.flatMap(l => pad8(l.getBytes("UTF-8") :+ 0.toByte))
        head ++ base ++ names ++ labels.indices.map(_.toByte).toArray
      }
      val msgs = Seq(
        0x01 -> dataspaceMsg(shape.toSeq),
        0x03 -> (if (szip || scaleOffsetInt) i16DtMsg
                 else if (nbitPrecision.isDefined) i16Dt(nbitPrecision.get)
                 else enumOf.map(enumDtMsg).getOrElse(f32Dt)),
        0x05 -> bodyBuf({ bb =>
          bb.put(2.toByte).put(1.toByte).put(0.toByte)
          v.fill match {
            case Some(f) if szip || int16Packed =>
              bb.put(1.toByte).putInt(2).putShort(f.toInt.toShort)
            case Some(f) if enumOf.isDefined =>
              bb.put(1.toByte).putInt(1).put(f.toInt.toByte)
            case Some(f) => bb.put(1.toByte).putInt(4).putFloat(f)
            case None => bb.put(0.toByte)
          }
        }, 12),
        0x08 -> layoutMsg) ++
        (if (!storeFiltered) Nil else Seq(0x0B -> bodyBuf({ bb =>
          bb.put(1.toByte).put(filterIds.size.toByte); bb.putShort(0); bb.putInt(0)
          filterIds.foreach { case (id, cvals) =>
            bb.putShort(id.toShort).putShort(0).putShort(0).putShort(cvals.size.toShort)
            cvals.foreach(bb.putInt)
            if (cvals.size % 2 == 1) bb.putInt(0)
          }
        }, 8 + filterIds.map(f => 8 + 4 * f._2.size + 4).sum))) ++ Seq(
        0x0C -> attrMsg("DIMENSION_LIST", vlenRefDt, dataspaceMsg(Seq(v.dims.size)), dimListData)) ++
        (if (int16Packed)
           // sentinel semantics live in the ATTRIBUTE (netcdf-c
           // writes _FillValue with the dataset's own int16 type)
           v.fill.map(f => 0x0C -> attrMsg("_FillValue", i16DtMsg, scalarDs,
             bodyBuf(bb => { bb.putShort(f.toInt.toShort); () }, 2))).toSeq
         else if (szip) Nil
         else if (enumOf.isDefined)
           // sentinel semantics live in the ATTRIBUTE (netcdf-c style);
           // the fill MESSAGE above is only the allocation background
           v.fill.map(f => 0x0C -> attrMsg("_FillValue", f64Dt,
             scalarDs, bodyBuf(bb => { bb.putDouble(f.toDouble); () }, 8))).toSeq
         else v.fill.map(f => 0x0C -> attrMsg("_FillValue", f32Dt,
          scalarDs, bodyBuf(bb => { bb.putFloat(f); () }, 4))).toSeq) ++
        v.numAttrs.toSeq.sortBy(_._1).map { case (n, d) =>
          0x0C -> attrMsg(n, f64Dt, scalarDs,
            bodyBuf(bb => { bb.putDouble(d); () }, 8)) }
      ohAddrs(v.name) = pos
      raw(objectHeader(msgs))
      padTo8()
      }
    }

    // extra OPAQUE-typed dataset (the runtime-metadata blob shape the
    // read side SKIPS with a diagnostic): v1 class-5 datatype with an
    // 8-byte ASCII tag, contiguous 16-byte payload
    if (opaqueExtra) {
      val dataAddr = pos
      raw(new Array[Byte](16))
      padTo8()
      val msgs = Seq(
        0x01 -> dataspaceMsg(Seq(2)),
        0x03 -> bodyBuf({ bb =>
          bb.put(0x15.toByte).put(8.toByte).put(0.toByte).put(0.toByte)
          bb.putInt(8) // element size
          bb.put("metatag".getBytes("UTF-8")).put(0.toByte) // 8-byte tag
        }, 16),
        0x08 -> bodyBuf({ bb =>
          bb.put(3.toByte).put(1.toByte)
          bb.putLong(dataAddr.toLong); bb.putLong(16L)
        }, 18))
      ohAddrs("runtime_meta") = pos
      raw(objectHeader(msgs))
      padTo8()
    }

    // extra BITFIELD-typed dataset (class 4): 2-byte LE elements whose
    // 5-bit value field sits at bit offset 2; every padding bit is
    // written DIRTY (set) so the reader's mask is observable
    if (bitfieldExtra) {
      val vals = Seq(0, 5, 17, 31)
      val dataAddr = pos
      raw(bodyBuf({ bb =>
        vals.foreach(v => bb.putShort((((v << 2) | 0xff83) & 0xffff).toShort))
      }, 2 * vals.size))
      padTo8()
      val msgs = Seq(
        0x01 -> dataspaceMsg(Seq(vals.size)),
        0x03 -> bodyBuf({ bb =>
          bb.put(0x14.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
          bb.putInt(2) // element size
          bb.putShort(2.toShort) // bit offset
          bb.putShort(5.toShort) // bit precision
        }, 12),
        0x08 -> bodyBuf({ bb =>
          bb.put(3.toByte).put(1.toByte)
          bb.putLong(dataAddr.toLong); bb.putLong((2L * vals.size))
        }, 18))
      ohAddrs("flags") = pos
      raw(objectHeader(msgs))
      padTo8()
    }

    // extra TIME-typed dataset (class 2, H5T_UNIX_D32LE shape):
    // 4-byte LE signed epoch seconds (one pre-epoch value so the
    // signed decode is observable); both exactly float-representable
    if (timeExtra) {
      val vals = Seq(1700000000, -86400)
      val dataAddr = pos
      raw(bodyBuf({ bb => vals.foreach(v => { bb.putInt(v); () }) }, 4 * vals.size))
      padTo8()
      val msgs = Seq(
        0x01 -> dataspaceMsg(Seq(vals.size)),
        0x03 -> bodyBuf({ bb =>
          bb.put(0x12.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
          bb.putInt(4) // element size
          bb.putShort(32.toShort) // bit precision
        }, 10),
        0x08 -> bodyBuf({ bb =>
          bb.put(3.toByte).put(1.toByte)
          bb.putLong(dataAddr.toLong); bb.putLong((4L * vals.size))
        }, 18))
      ohAddrs("stamps") = pos
      raw(objectHeader(msgs))
      padTo8()
    }

    // child group holding the data variables (nested-group layout):
    // its own SNOD + B-tree + symbol-table header, names resolved
    // through the shared local heap
    subgroup.foreach { sub =>
      val childNames = dataVars.map(_.name).sorted
      val snodAddr = pos
      raw("SNOD".getBytes); u16(1); u16(childNames.size)
      childNames.foreach { n =>
        u64(nameOffs(n)); u64(ohAddrs(n)); u32(0); u32(0)
        out.write(new Array[Byte](16))
      }
      padTo8()
      val btreeAddr = pos
      raw("TREE".getBytes); u8(0); u8(0); u16(1)
      u64(Undef); u64(Undef)
      u64(nameOffs(childNames.head)); u64(snodAddr); u64(nameOffs(childNames.last))
      padTo8()
      ohAddrs(sub) = pos
      raw(objectHeader(Seq(0x11 -> bodyBuf({ bb =>
        bb.putLong(btreeAddr.toLong); bb.putLong(heapAddr.toLong)
      }, 16))))
      padTo8()
    }

    val rootAddr: Long = if (!denseRoot) {
      // SNOD with entries sorted by link name; soft links store as
      // cache-type-2 entries whose scratch word is the local-heap
      // offset of the path string (the default libhdf5 layout)
      val snodAddr = pos
      val rootSoft = softLinks.toMap
      val sorted = (allNames ++ softLinks.map(_._1)).sorted
      raw("SNOD".getBytes); u16(1); u16(sorted.size)
      sorted.foreach { n =>
        u64(nameOffs(n))
        rootSoft.get(n) match {
          case Some(target) =>
            u64(Undef); u32(2); u32(0)
            u32(nameOffs(target)); u32(0); u64(0) // scratch: path offset
          case None =>
            u64(ohAddrs(n)); u32(0); u32(0)
            out.write(new Array[Byte](16))
        }
      }
      padTo8()

      // group B-tree: one leaf pointing at the SNOD
      val btreeAddr = pos
      raw("TREE".getBytes); u8(0); u8(0); u16(1)
      u64(Undef); u64(Undef)
      u64(nameOffs(sorted.head)); u64(snodAddr); u64(nameOffs(sorted.last))
      padTo8()

      // root group object header; external links ride as LINK (0x06)
      // messages beside the symbol table (linksOf walks both) —
      // (link name, target file, target path), v1 message with the
      // explicit-type flag, class 64, NUL-terminated value strings
      val a = pos
      raw(objectHeader(Seq(0x11 -> bodyBuf({ bb =>
        bb.putLong(btreeAddr.toLong); bb.putLong(heapAddr.toLong)
      }, 16)) ++ externalLinks.map { case (n, f, pth) =>
        val nb = n.getBytes("UTF-8")
        val fb = f.getBytes("UTF-8"); val pb2 = pth.getBytes("UTF-8")
        require(nb.length < 256, "external link name too long")
        0x06 -> bodyBuf({ bb =>
          bb.put(1.toByte).put(0x08.toByte).put(64.toByte)
          bb.put(nb.length.toByte).put(nb)
          bb.putShort((1 + fb.length + 1 + pb2.length + 1).toShort)
          bb.put(0.toByte).put(fb).put(0.toByte).put(pb2).put(0.toByte)
        }, 7 + nb.length + fb.length + pb2.length + 3)
      }))
      a.toLong
    } else {
      // ---- dense root group: the NEW-style layout netcdf-c emits for
      // groups past the 8-link compact threshold — links live as
      // fractal-heap objects indexed by a name B-tree v2, and the root
      // object header carries only a Link Info message. Geometry
      // mirrors libhdf5 defaults: width 4, 512-byte start block,
      // 64 KiB max direct block, 32-bit max heap size → 7-byte IDs.
      // Block/record checksums are written zero and record hashes are
      // not the Jenkins name hash (records here are in creation order)
      // — this codec's reader consults neither, and the caveat is the
      // price of fabricating fixtures without libhdf5.
      val width = 4; val startBlk = 512L; val maxDirectBlk = 65536L
      val offSize = 4
      val heapIdLen = if (denseIdStyle == "tinyhuge") 18 else 7
      // tiny/huge styles declare a small max-managed-object size so a
      // long link name legitimately overflows to huge storage, exactly
      // as libhdf5 routes objects past the FRHP limit
      val maxManagedObj = if (denseIdStyle == "managed") maxDirectBlk else 96L
      val dbHeader = 5 + 8 + offSize // flags=0: no block checksum
      def rowSize(r: Int): Long = if (r < 2) startBlk else startBlk << (r - 1)
      def linkBody(name: String, addr: Long): Array[Byte] = {
        val nb = name.getBytes("UTF-8")
        require(nb.length < 256, "link name too long for 1-byte length")
        bodyBuf({ bb =>
          bb.put(1.toByte).put(0.toByte).put(nb.length.toByte).put(nb).putLong(addr)
        }, 11 + nb.length)
      }
      def softBody(name: String, path: String): Array[Byte] = {
        val nb = name.getBytes("UTF-8"); val pb = path.getBytes("UTF-8")
        require(nb.length < 256 && pb.length < 65536, "soft link name/path too long")
        bodyBuf({ bb =>
          bb.put(1.toByte).put(0x08.toByte).put(1.toByte) // flags: explicit type; 1 = soft
            .put(nb.length.toByte).put(nb)
            .putShort(pb.length.toShort).put(pb)
        }, 6 + nb.length + pb.length)
      }
      val softMap = softLinks.toMap
      val denseNames = allNames ++ softLinks.map(_._1)
      def bodyOf(n: String): Array[Byte] =
        softMap.get(n).map(t => softBody(n, t)).getOrElse(linkBody(n, ohAddrs(n)))
      // per-link heap ID: managed (block offset + length), tiny (body
      // embedded in the ID), or huge (direct address, or a key into the
      // huge-object B-tree)
      sealed trait Hid
      case class Managed(lo: Long, len: Int) extends Hid
      case class Tiny(body: Array[Byte]) extends Hid
      case class Huge(addr: Long, len: Int, id: Long) extends Hid
      // huge bodies store as raw contiguous objects, written FIRST so
      // their addresses are known before any layout arithmetic
      padTo8()
      // (name, address, stored length, de-filtered length) — the two
      // lengths differ only on filtered heaps, where huge bodies run
      // through the heap's own pipeline (deflate here)
      val hugeObjs = scala.collection.mutable.Buffer[(String, Long, Int, Int)]()
      val tinyByName = scala.collection.mutable.Map[String, Array[Byte]]()
      for (n <- denseNames) {
        val lb = bodyOf(n)
        if (denseIdStyle != "managed" && lb.length > maxManagedObj) {
          val stored = if (!filteredHeap) lb else {
            val defl = new java.util.zip.Deflater()
            defl.setInput(lb); defl.finish()
            val zb = new Array[Byte](lb.length + 64)
            val nz = defl.deflate(zb)
            defl.end()
            java.util.Arrays.copyOf(zb, nz)
          }
          hugeObjs += ((n, pos.toLong, stored.length, lb.length)); raw(stored)
        } else if (denseIdStyle == "tinyhuge" &&
                   lb.length <= math.min(16, heapIdLen - 1)) {
          tinyByName(n) = lb
        }
      }
      padTo8()
      val hugeByName = hugeObjs.zipWithIndex.map { case ((n, a, l, _), i) =>
        n -> Huge(a, l, i + 1L)
      }.toMap
      // pack the remaining (managed) link bodies into direct blocks in
      // creation order; logical offsets count block headers, exactly
      // like a real heap
      case class Blk(row: Int, col: Int, logical: Long, size: Long,
                     objs: scala.collection.mutable.Buffer[(Long, Array[Byte])])
      val blocks = scala.collection.mutable.Buffer[Blk]()
      var fill = 0L
      val heapIds = scala.collection.mutable.Buffer[(String, Hid)]() // creation order
      for (n <- denseNames) {
        if (hugeByName.contains(n)) heapIds += ((n, hugeByName(n)))
        else if (tinyByName.contains(n)) heapIds += ((n, Tiny(tinyByName(n))))
        else {
          val lb = bodyOf(n)
          require(lb.length <= startBlk - dbHeader, s"link body for '$n' exceeds a start block")
          if (blocks.isEmpty || fill + lb.length > blocks.last.size) {
            val (r, c) =
              if (blocks.isEmpty) (0, 0)
              else if (blocks.last.col + 1 < width) (blocks.last.row, blocks.last.col + 1)
              else (blocks.last.row + 1, 0)
            val logical = if (blocks.isEmpty) 0L else blocks.last.logical + blocks.last.size
            blocks += Blk(r, c, logical, rowSize(r), scala.collection.mutable.Buffer())
            fill = dbHeader
          }
          val b = blocks.last
          heapIds += ((n, Managed(b.logical + fill, lb.length)))
          b.objs += ((b.logical + fill, lb)); fill += lb.length
        }
      }
      require(blocks.nonEmpty,
        "fixture writer: at least one managed link is required")
      val singleDirect = blocks.size == 1
      val nRows = blocks.last.row + 1
      padTo8()

      // layout: [direct blocks][FHIB?][FRHP][BTLF][BTHD][root OH] —
      // sizes are deterministic (filtered blocks pre-compress below),
      // so every forward address is computed here and asserted
      def align8(v: Long) = (v + 7) & ~7L
      val base = pos.toLong
      // filtered heaps compress each WHOLE direct block (header + data)
      // up front so layout addresses are known; the per-block filtered
      // sizes flow into the FHIB entries / FRHP root fields
      val frhpAddrSlot = new Array[Long](1) // patched into block headers
      def fhdbBytes(b: Blk): Array[Byte] = {
        val buf = ByteBuffer.allocate(b.size.toInt).order(ByteOrder.LITTLE_ENDIAN)
        buf.put('F'.toByte).put('H'.toByte).put('D'.toByte).put('B'.toByte)
        buf.put(0.toByte)
        buf.putLong(frhpAddrSlot(0))
        buf.putInt(b.logical.toInt) // block offset, offSize bytes
        for ((lo, body) <- b.objs) { buf.position((lo - b.logical).toInt); buf.put(body) }
        buf.array()
      }
      def deflateAll(bs: Array[Byte]): Array[Byte] = {
        val d = new java.util.zip.Deflater()
        d.setInput(bs); d.finish()
        val out0 = new Array[Byte](bs.length + 64)
        val n0 = d.deflate(out0); d.end()
        java.util.Arrays.copyOf(out0, n0)
      }
      // NOTE: the FRHP address is referenced inside each block header,
      // and compressed sizes depend on content — resolve the circle by
      // computing sizes with a placeholder FRHP address of 0, then
      // compressing FINAL content once addresses are fixed. To keep
      // compressed sizes stable, the reader never checks the embedded
      // heap-header address, so the placeholder simply stays 0 in
      // filtered fixtures.
      val filteredBlocks: Seq[Array[Byte]] =
        if (filteredHeap) blocks.toSeq.map(b => deflateAll(fhdbBytes(b))) else Nil
      def storedSize(i: Int): Long =
        if (filteredHeap) filteredBlocks(i).length.toLong else blocks(i).size
      val blockAddrs = blocks.indices.scanLeft(base)((a, i) => a + storedSize(i)).init
      var at = align8(base + blocks.indices.map(storedSize).sum)
      val fhibAddr = at
      val dirEntryW = if (filteredHeap) 20 else 8
      if (!singleDirect) at = align8(at + 13 + offSize + nRows * width * dirEntryW.toLong + 4)
      val pipelineMsg: Array[Byte] =
        if (!filteredHeap) Array.emptyByteArray
        else bodyBuf({ b2 =>
          b2.put(2.toByte).put(1.toByte) // v2, one filter
          b2.putShort(1).putShort(0).putShort(1).putInt(6) // deflate, 1 cval, level 6
        }, 12)
      val frhpAddr = at
      at = align8(at + 146 + (if (filteredHeap) 12 + pipelineMsg.length else 0))
      val recordSize = 4 + heapIdLen
      // leaf partitioning: past one leaf's capacity the index becomes a
      // depth-1 tree — k leaves in record order with k-1 separator
      // records pulled up into a BTIN root (the reader consults neither
      // hashes nor balance, only completeness)
      val nodeSize = 2048
      val leafCap = (nodeSize - 10) / recordSize
      val perLeaf = math.min(leafCap, 120)
      val leafChunks = scala.collection.mutable.Buffer[Seq[(String, Hid)]]()
      val sepRecords = scala.collection.mutable.Buffer[(String, Hid)]()
      if (heapIds.size <= leafCap) leafChunks += heapIds.toSeq
      else {
        var rest = heapIds.toSeq
        while (rest.nonEmpty) {
          val take = math.min(perLeaf, rest.size)
          leafChunks += rest.take(take)
          rest = rest.drop(take)
          if (rest.nonEmpty) { sepRecords += rest.head; rest = rest.tail }
        }
      }
      val deep = leafChunks.size > 1
      val leafAddrs = scala.collection.mutable.Buffer[Long]()
      leafChunks.foreach { ch =>
        leafAddrs += at; at = align8(at + 6 + ch.size * recordSize + 4)
      }
      val btinAddr = at
      if (deep) at = align8(at + 6 + sepRecords.size * recordSize +
        leafChunks.size * 9L + 4) // child ptr: addr(8) + nrec(1)
      val bthdAddr = at
      // indirect huge IDs resolve through a second, single-leaf v2
      // B-tree (record type 1: address 8 + length 8 + id 8 = 24 bytes)
      val hugeBtree = denseIdStyle == "hugebtree" && hugeObjs.nonEmpty
      val hugeBtlfAddr = align8(bthdAddr + 38)
      val hugeBthdAddr = align8(hugeBtlfAddr + 6 +
        hugeObjs.size * (if (filteredHeap) 36L else 24L) + 4)

      frhpAddrSlot(0) = if (filteredHeap) 0L else frhpAddr
      for ((i, ai) <- blocks.indices.zip(blockAddrs)) {
        require(pos.toLong == ai, s"direct-block layout drift at $ai")
        if (filteredHeap) raw(filteredBlocks(i))
        else raw(fhdbBytes(blocks(i)))
      }
      padTo8()
      if (!singleDirect) {
        require(pos.toLong == fhibAddr, "FHIB layout drift")
        raw("FHIB".getBytes); u8(0); u64(frhpAddr); u32(0) // root block offset = 0
        for (r <- 0 until nRows; c <- 0 until width) {
          val bi = blocks.indexWhere(b => b.row == r && b.col == c)
          u64(if (bi >= 0) blockAddrs(bi) else Undef)
          if (filteredHeap) { // direct entries gain (size, mask)
            u64(if (bi >= 0) storedSize(bi) else 0L); u32(0)
          }
        }
        u32(0) // checksum (unread)
        padTo8()
      }
      require(pos.toLong == frhpAddr, "FRHP layout drift")
      raw("FRHP".getBytes); u8(0)
      u16(heapIdLen); u16(if (filteredHeap) pipelineMsg.length else 0)
      u8(0) // flags: no checksummed blocks
      u32(maxManagedObj) // max managed object size
      u64(hugeObjs.size.toLong) // next huge ID
      u64(if (hugeBtree) hugeBthdAddr else Undef) // huge B-tree v2
      u64(0); u64(Undef) // free space, free-space manager
      val managed = blocks.map(_.size).sum
      u64(managed); u64(managed); u64(managed) // managed, allocated, iterator
      val nTiny = heapIds.count(_._2.isInstanceOf[Tiny])
      u64((denseNames.size - hugeObjs.size - nTiny).toLong) // managed objects
      u64(hugeObjs.map(_._3.toLong).sum); u64(hugeObjs.size.toLong) // huge size + count
      u64(tinyByName.values.map(_.length.toLong).sum); u64(nTiny.toLong) // tiny size + count
      u16(width); u64(startBlk); u64(maxDirectBlk)
      u16(32) // max heap size (bits) → 4-byte offsets
      u16(1) // starting rows in root indirect block
      u64(if (singleDirect) blockAddrs.head else fhibAddr)
      u16(if (singleDirect) 0 else nRows)
      if (filteredHeap) { // filtered root direct block size + mask + pipeline
        u64(if (singleDirect) storedSize(0) else 0L)
        u32(0)
        raw(pipelineMsg)
      }
      u32(0) // checksum (unread)
      padTo8()
      def record(id: Hid): Unit = {
        u32(0) // name hash (unread by this codec's reader)
        val before = pos
        id match {
          case Managed(lo, len) => u8(0); u32(lo); u16(len)
          case Tiny(body) => u8(0x20 | (body.length - 1)); raw(body)
          case Huge(addr, len, hid) =>
            if (denseIdStyle == "tinyhuge") { u8(0x10); u64(addr); u64(len.toLong) }
            else { // indirect: the B-tree key in the remaining ID bytes
              u8(0x10)
              var v = hid
              for (_ <- 0 until heapIdLen - 1) { u8((v & 0xff).toInt); v >>= 8 }
            }
        }
        while (pos - before < heapIdLen) u8(0) // IDs are fixed-width
      }
      for ((ch, ai) <- leafChunks.zip(leafAddrs)) {
        require(pos.toLong == ai, "BTLF layout drift")
        raw("BTLF".getBytes); u8(0); u8(5) // version, type 5: link-name index
        ch.foreach { case (_, id) => record(id) }
        u32(0) // checksum (unread)
        padTo8()
      }
      if (deep) {
        require(pos.toLong == btinAddr, "BTIN layout drift")
        raw("BTIN".getBytes); u8(0); u8(5)
        sepRecords.foreach { case (_, id) => record(id) }
        for ((ch, ai) <- leafChunks.zip(leafAddrs)) { u64(ai); u8(ch.size) }
        u32(0) // checksum (unread)
        padTo8()
      }
      require(pos.toLong == bthdAddr, "BTHD layout drift")
      raw("BTHD".getBytes); u8(0); u8(5)
      u32(nodeSize); u16(recordSize)
      u16(if (deep) 1 else 0) // depth
      u8(100); u8(40) // split/merge percents (libhdf5 defaults)
      u64(if (deep) btinAddr else leafAddrs.head)
      u16(if (deep) sepRecords.size else denseNames.size)
      u64(denseNames.size.toLong)
      u32(0) // checksum (unread)
      padTo8()
      if (hugeBtree) {
        require(pos.toLong == hugeBtlfAddr, "huge BTLF layout drift")
        // type 1 (huge indirect) or 3 (huge indirect FILTERED: stored
        // length + mask + de-filtered size precede the id)
        raw("BTLF".getBytes); u8(0); u8(if (filteredHeap) 3 else 1)
        hugeObjs.zipWithIndex.foreach { case ((_, a, l, mem), i) =>
          u64(a); u64(l.toLong)
          if (filteredHeap) { u32(0); u64(mem.toLong) }
          u64(i + 1L)
        }
        u32(0) // checksum (unread)
        padTo8()
        require(pos.toLong == hugeBthdAddr, "huge BTHD layout drift")
        raw("BTHD".getBytes); u8(0); u8(if (filteredHeap) 3 else 1)
        u32(nodeSize); u16(if (filteredHeap) 36 else 24)
        u16(0) // depth: single leaf
        u8(100); u8(40)
        u64(hugeBtlfAddr)
        u16(hugeObjs.size)
        u64(hugeObjs.size.toLong)
        u32(0) // checksum (unread)
        padTo8()
      }

      // root object header: Link Info only (new-style group)
      val a = pos
      raw(objectHeader(Seq(0x02 -> bodyBuf({ bb =>
        bb.put(0.toByte).put(0.toByte) // version, flags (no creation order)
        bb.putLong(frhpAddr); bb.putLong(bthdAddr)
      }, 18))))
      a.toLong
    }

    // superblock v0, patched into the reserved prefix
    val bytes = out.toByteArray
    val sb = ByteBuffer.wrap(bytes, 0, 96).order(ByteOrder.LITTLE_ENDIAN)
    sb.put(0x89.toByte).put('H'.toByte).put('D'.toByte).put('F'.toByte)
      .put('\r'.toByte).put('\n'.toByte).put(0x1a.toByte).put('\n'.toByte)
    sb.put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte) // sb/fs/root versions + reserved
    sb.put(0.toByte).put(8.toByte).put(8.toByte).put(0.toByte) // shm ver, offsets, lengths, reserved
    sb.putShort(4).putShort(16) // group leaf / internal K
    sb.putInt(0) // consistency flags
    sb.putLong(0) // base address
    sb.putLong(Undef) // free-space info
    sb.putLong(bytes.length.toLong) // end of file
    sb.putLong(Undef) // driver info
    sb.putLong(0) // root entry: link name offset
    sb.putLong(rootAddr.toLong) // root entry: object header
    sb.putInt(0).putInt(0) // cache type + reserved
    bytes
  }
}
