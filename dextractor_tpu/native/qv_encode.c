/* Host-side Huffman channel encoder (CPU fallback for the TPU pipeline).
 *
 * Replicates the reference's 32-bit OCODE emitter byte for byte
 * (QV.c:404-506) including the tail-padding rule, the escape literal
 * (8-bit value / 16-bit run length), and the unconditional run-escape
 * test against symbol 255's code.  All entries of one channel are encoded
 * in a single call over concatenated streams.
 *
 * Build: gcc -O2 -shared -fPIC qv_encode.c -o _qv_encode.so
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef struct
  { uint8_t  *out;
    int64_t   cap;
    int64_t   len;
    uint32_t  accum;      /* bits not yet written, MSB-justified */
    int       fill;       /* occupied bits of accum */
    int       prev_fill;  /* fill before the last emit (tail rule) */
  } Emit;

static inline int put_word(Emit *e, uint32_t w)
{ if (e->len + 4 > e->cap)
    return -1;
  memcpy(e->out + e->len, &w, 4);     /* little-endian host */
  e->len += 4;
  return 0;
}

static inline int emit_bits(Emit *e, uint32_t code, int len)
{ int t = e->fill + len;
  e->prev_fill = e->fill;
  if (t >= 32)
    { e->fill = t - 32;
      e->accum |= (e->fill ? (code >> e->fill) : code);
      if (put_word(e, e->accum) < 0)
        return -1;
      e->accum = e->fill ? (code << (32 - e->fill)) : 0;
    }
  else
    { e->fill = t;
      e->accum |= code << (32 - t);
    }
  return 0;
}

static inline int flush_tail(Emit *e)
{ if (e->fill > 0)
    { if (put_word(e, e->accum) < 0)
        return -1;
      if (e->prev_fill > 16 && e->fill > e->prev_fill)
        if (put_word(e, e->accum) < 0)
          return -1;
    }
  else if (e->prev_fill > 16)
    if (put_word(e, e->accum) < 0)
      return -1;
  e->accum = 0;
  e->fill = 0;
  e->prev_fill = 0;
  return 0;
}

/* Encode n_entries plain streams (concatenated in data with offs[n+1]).
 * Returns total bytes or -1 on cap overflow.  out_lens: bytes per entry.
 *
 * Fast path: per-symbol "effective" codes fold the type-2 escape literal
 * into a single <=24-bit emission (code<<8 | value), and a 64K pair table
 * pre-concatenates two effective codes (<=48 bits) so the body of every
 * entry costs one table load and one 128-bit shift-or per symbol pair —
 * the QV alphabet is skewed, so the table's hot rows stay cached.  Only
 * the LAST emission of each entry goes through the exact scalar emitter,
 * which is what keeps prev_fill (the duplicate-word tail-padding rule,
 * QV.c:436-442) byte-identical to the reference. */
long long dxt_encode_plain(
    const uint8_t *data, const int64_t *offs, long long n_entries,
    const uint32_t *bits, const int32_t *lens, int type,
    uint8_t *out, long long cap, int64_t *out_lens)
{ Emit     e = { out, cap, 0, 0, 0, 0 };
  uint32_t esc_code = type == 2 ? bits[255] : 0xffffffffu;
  int      esc_len = type == 2 ? lens[255] : -1;
  int64_t  i, before;
  uint32_t eff_bits[256];
  uint8_t  eff_len[256];
  uint64_t *pair_bits;
  uint8_t  *pair_len;
  int      s1, s2;

  for (s1 = 0; s1 < 256; s1++)
    { if (bits[s1] == esc_code && lens[s1] == esc_len)
        { eff_bits[s1] = (esc_code << 8) | (uint32_t) s1;
          eff_len[s1] = (uint8_t) (esc_len + 8);
        }
      else
        { eff_bits[s1] = bits[s1];
          eff_len[s1] = (uint8_t) lens[s1];
        }
    }
  pair_bits = (uint64_t *) malloc((size_t) 65536 * sizeof(uint64_t));
  pair_len = (uint8_t *) malloc(65536);
  if (pair_bits == NULL || pair_len == NULL)
    { free(pair_bits);
      free(pair_len);
      return -1;
    }
  for (s1 = 0; s1 < 256; s1++)
    { uint64_t b1 = eff_bits[s1];
      int      l1 = eff_len[s1];
      uint64_t *row = pair_bits + ((size_t) s1 << 8);
      uint8_t  *rl = pair_len + ((size_t) s1 << 8);
      for (s2 = 0; s2 < 256; s2++)
        { row[s2] = (b1 << eff_len[s2]) | eff_bits[s2];
          rl[s2] = (uint8_t) (l1 + eff_len[s2]);
        }
    }

  for (i = 0; i < n_entries; i++)
    { const uint8_t *s = data + offs[i];
      int64_t        L = offs[i + 1] - offs[i];
      before = e.len;
      if (L > 1)
        { int64_t            body = L - 1, j = 0;
          unsigned __int128  acc = ((unsigned __int128) e.accum) << 96;
          int                fill = e.fill;
          for (; j + 1 < body; j += 2)
            { uint32_t idx = ((uint32_t) s[j] << 8) | s[j + 1];
              int      pl = pair_len[idx];
              if (pl)
                acc |= ((unsigned __int128) pair_bits[idx])
                       << (128 - fill - pl);
              fill += pl;
              while (fill >= 32)
                { if (put_word(&e, (uint32_t) (acc >> 96)) < 0)
                    goto fail;
                  acc <<= 32;
                  fill -= 32;
                }
            }
          if (j < body)
            { uint32_t x = s[j];
              int      el = eff_len[x];
              if (el)
                acc |= ((unsigned __int128) eff_bits[x])
                       << (128 - fill - el);
              fill += el;
              while (fill >= 32)
                { if (put_word(&e, (uint32_t) (acc >> 96)) < 0)
                    goto fail;
                  acc <<= 32;
                  fill -= 32;
                }
            }
          e.accum = (uint32_t) (acc >> 96);
          e.fill = fill;
        }
      if (L > 0)
        { uint8_t  x = s[L - 1];
          uint32_t c = bits[x];
          int      n = lens[x];
          if (emit_bits(&e, c, n) < 0)
            goto fail;
          if (c == esc_code && n == esc_len)
            if (emit_bits(&e, x, 8) < 0)
              goto fail;
        }
      if (flush_tail(&e) < 0)
        goto fail;
      out_lens[i] = e.len - before;
    }
  free(pair_bits);
  free(pair_len);
  return e.len;

fail:
  free(pair_bits);
  free(pair_len);
  return -1;
}

long long dxt_encode_run(
    const uint8_t *data, const int64_t *offs, long long n_entries,
    const uint32_t *nbits, const int32_t *nlens, int ntype,
    const uint32_t *rbits, const int32_t *rlens, int rchar,
    uint8_t *out, long long cap, int64_t *out_lens)
{ Emit     e = { out, cap, 0, 0, 0, 0 };
  uint32_t esc_code = ntype == 2 ? nbits[255] : 0xffffffffu;
  int      esc_len = ntype == 2 ? nlens[255] : -1;
  uint32_t run_esc_code = rbits[255];
  int      run_esc_len = rlens[255];
  int64_t  i, before;

  for (i = 0; i < n_entries; i++)
    { int64_t k = offs[i], end = offs[i + 1];
      before = e.len;
      while (k < end)
        { int64_t  h = k;
          uint32_t c;
          int      n, x;
          while (k < end && data[k] == (uint8_t) rchar)
            k += 1;
          x = (k - h >= 255) ? 255 : (int) (k - h);
          c = rbits[x];
          n = rlens[x];
          if (emit_bits(&e, c, n) < 0)
            return -1;
          if (c == run_esc_code && n == run_esc_len)
            if (emit_bits(&e, (uint32_t) ((k - h) & 0xffff), 16) < 0)
              return -1;
          if (k < end)
            { uint8_t s = data[k];
              c = nbits[s];
              n = nlens[s];
              if (emit_bits(&e, c, n) < 0)
                return -1;
              if (c == esc_code && n == esc_len)
                if (emit_bits(&e, s, 8) < 0)
                  return -1;
              k += 1;
            }
        }
      if (flush_tail(&e) < 0)
        return -1;
      out_lens[i] = e.len - before;
    }
  return e.len;
}

/* Histogram_Runs (QV.c:702-724) over concatenated entries: one run
 * token (min(len,255)) before each non-rchar literal plus a trailing
 * token when an entry ends in rchar characters.  Single cache-friendly
 * pass; accumulates into hist[256]. */
void dxt_run_hist(
    const uint8_t *data, const int64_t *offs, long long n_entries,
    int rchar, int64_t *hist)
{ long long i;
  for (i = 0; i < n_entries; i++)
    { int64_t k = offs[i], end = offs[i + 1];
      while (k < end)
        { int64_t h = k;
          while (k < end && data[k] == (uint8_t) rchar)
            k += 1;
          hist[(k - h >= 255) ? 255 : (int) (k - h)] += 1;
          if (k < end)
            k += 1;
        }
    }
}

/* QVcoding_Scan's flat-histogram phase (QV.c:988-991 + 993-1002) in one
 * pass: four 256-bin histograms over the del/ins/mrg/sub streams plus
 * the first index whose delTag is 'n'/'N' (-1 when absent).  hist4 is
 * 4*256 int64, zeroed by the caller. */
void dxt_qv_scan_hists(
    const uint8_t *del, const uint8_t *ins, const uint8_t *mrg,
    const uint8_t *sub, const uint8_t *tag, long long total,
    int64_t *hist4, int64_t *first_n)
{ int64_t *hd = hist4, *hi = hist4 + 256, *hm = hist4 + 512, *hs = hist4 + 768;
  long long i;
  *first_n = -1;
  for (i = 0; i < total; i++)
    { hd[del[i]] += 1;
      hi[ins[i]] += 1;
      hm[mrg[i]] += 1;
      hs[sub[i]] += 1;
      if (*first_n < 0 && (tag[i] == 'n' || tag[i] == 'N'))
        *first_n = i;
    }
}

/* Ragged scatter-copy: entry i's lens[i] bytes move from the running
 * source offset in flat to dst_off[i] in out.  The container assembler's
 * hot loop (one memcpy per entry beats NumPy's fancy-index scatter by
 * ~100x on multi-MB images). */
void dxt_ragged_copy(
    uint8_t *out, const int64_t *dst_off, const uint8_t *flat,
    const int64_t *lens, long long n)
{ int64_t src = 0;
  long long i;
  for (i = 0; i < n; i++)
    { memcpy(out + dst_off[i], flat + src, (size_t) lens[i]);
      src += lens[i];
    }
}

/* Ragged gather-copy: piece i moves from src + src_off[i] to the running
 * output offset.  The text parsers' hot loop (collect sequence lines,
 * drop headers/newlines) — one memcpy per line. */
void dxt_gather_copy(
    uint8_t *out, const uint8_t *src, const int64_t *src_off,
    const int64_t *lens, long long n)
{ int64_t dst = 0;
  long long i;
  for (i = 0; i < n; i++)
    { memcpy(out + dst, src + src_off[i], (size_t) lens[i]);
      dst += lens[i];
    }
}

/* Pack_Tag + Number_Read + Compress_Read for all entries: keep tag bytes
 * where del != rchar (or all, rchar < 0), 2-bit pack.  Returns total. */
long long dxt_pack_tags(
    const uint8_t *tag, const uint8_t *del, const int64_t *offs,
    long long n_entries, int rchar, const uint8_t *number_lut,
    uint8_t *out, long long cap, int64_t *out_lens)
{ int64_t i, k, total = 0;

  for (i = 0; i < n_entries; i++)
    { int64_t  clen = 0;
      uint8_t  acc = 0;
      int      nin = 0;
      int64_t  before = total;
      for (k = offs[i]; k < offs[i + 1]; k++)
        { if (rchar >= 0 && del[k] == (uint8_t) rchar)
            continue;
          acc = (uint8_t) ((acc << 2) | number_lut[tag[k]]);
          nin += 1;
          clen += 1;
          if (nin == 4)
            { if (total + 1 > cap) return -1;
              out[total++] = acc;
              acc = 0;
              nin = 0;
            }
        }
      if (nin > 0)
        { if (total + 1 > cap) return -1;
          out[total++] = (uint8_t) (acc << (2 * (4 - nin)));
        }
      out_lens[i] = total - before;
    }
  return total;
}
